"""Flat, record-driven, device-resident picture reconstruction.

The round-3 device path (tpu/recon.py) replayed a Python CU tree from
the native parse records and ping-ponged planes between host and device
(MC outputs downloaded, residual add on host, plane re-uploaded for the
intra scan, downloaded, re-uploaded for deblock).  This module is the
TPU-first redesign of the same stages (replacing the reference's
per-CU interleaved reconstruct loop, ref: src/xvc_dec_lib/
cu_decoder.cc:86-138):

  - the native CABAC parse + MV derivation emit a flat (N, 72) int32
    record table plus one flat coefficient arena (native/pic.py
    parse_picture, xvcn_pic.inc xvcn_export_parse) — the per-picture
    syntax tensors; NO Python CU objects are ever built;
  - all job/group metadata (dequant+ITX batches, MC batches, intra scan
    metadata, deblock edge metadata) is derived from the record table
    with vectorized numpy;
  - reference pictures live in a device-resident frame store (the HBM
    role of the reference's in-memory YuvPicture ref planes,
    ref: src/xvc_common_lib/yuv_pic.h:52-104): one (S, Hp, Wp)
    superstack per component, updated in place (donated buffers) when a
    picture finishes its deblock, so NO reference plane is ever
    re-uploaded or re-stacked per picture;
  - residuals and predictions scatter into device planes; bi-average,
    residual add and clipping run on device; the intra luma/chroma
    lax.scan stages consume the device planes directly; the deblock
    stage consumes them and the final picture is downloaded ONCE.

Bit-exactness vs the host path is pinned by the golden decode matrix
(tests/test_jax_decode.py) — the flat path produces identical planes or
is not used at all (eligibility below; LIC pictures, restricted intra
toolsets and non-4:2:0 chroma fall back to tpu/recon.py).
"""
import functools
import threading

import numpy as np

from .. import constants as k
from ..codec import inter_mc as mc
from ..codec import inter_mv as mv_mod
from ..ops.quant import Qp
from . import dsp
from . import intra_scan

# ---------------------------------------------------------------------------
# Parse-record column layout (must match xvcn_pic.inc xvcn_export_parse)
# ---------------------------------------------------------------------------
C_TREE, C_DEPTH, C_X, C_Y, C_W, C_H, C_SPLIT = range(7)
C_PRED, C_QP, C_SKIP, C_MERGE, C_MERGEIDX, C_DIR, C_FULLPEL, C_AFFINE, \
    C_LIC, C_ROOTCBF = 11, 12, 13, 14, 15, 16, 17, 18, 19, 20
C_CBF0, C_TSKIP0, C_DCONLY0 = 21, 24, 27
C_TT00, C_TT01, C_TT10, C_TT11, C_TXSEL = 30, 31, 32, 33, 34
C_REF0, C_REF1, C_IML, C_IMC = 35, 36, 39, 40
C_MV = 41            # [list][corner][x/y]: 41 + 8*l + 2*c (+1 for y)
C_COEFF0 = 65
C_SBL, C_SAR, C_ORDER = 68, 69, 70

_BIG = 1 << 20       # out-of-bounds scatter target (dropped by XLA)


# ---------------------------------------------------------------------------
# Device-resident frame store (the HBM DPB)
# ---------------------------------------------------------------------------

class FrameStore:
    """Per-plane-geometry device store: superstacks (S, Hp, Wp) int16
    for luma and (S, 2, Hp, Wp) for chroma.  Slots are assigned per
    decoded picture and updated with donated buffers, so the update is
    in place on device; MC kernels gather windows straight from the
    superstack (reshaped (S*2,...) for chroma)."""

    def __init__(self, luma_shape, chroma_shape, n0=8, device=None):
        self.luma_shape = luma_shape
        self.chroma_shape = chroma_shape  # None for monochrome
        self.device = device  # mesh pin device (None = default device)
        self.lock = threading.Lock()
        self.n = 0
        self.free = []
        self.luma = None
        self.chroma = None
        self._grow(n0)

    def _grow(self, new_n):
        import jax.numpy as jnp
        old_n = self.n
        kw = {"device": self.device} if self.device is not None else {}
        luma = jnp.zeros((new_n,) + self.luma_shape, jnp.int16, **kw)
        if old_n:
            luma = luma.at[:old_n].set(self.luma)
        self.luma = luma
        if self.chroma_shape is not None:
            ch = jnp.zeros((new_n, 2) + self.chroma_shape, jnp.int16,
                           **kw)
            if old_n:
                ch = ch.at[:old_n].set(self.chroma)
            self.chroma = ch
        self.free.extend(range(old_n, new_n))
        self.n = new_n

    def put(self, dev_planes):
        """dev_planes: {comp: (Hp, Wp) int16 device array}.  Returns the
        slot index.  Thread-safe; updates are donated (in place)."""
        import jax.numpy as jnp
        with self.lock:
            if not self.free:
                self._grow(self.n * 2)
            slot = self.free.pop()
            self.luma = _store_set3(self.luma.shape)(
                self.luma, dev_planes[0].astype(jnp.int16), slot)
            if self.chroma_shape is not None and 1 in dev_planes:
                pair = jnp.stack([dev_planes[1], dev_planes[2]]) \
                    .astype(jnp.int16)
                self.chroma = _store_set4(self.chroma.shape)(
                    self.chroma, pair, slot)
            return slot

    def release(self, slot):
        with self.lock:
            if slot not in self.free:
                self.free.append(slot)

    def plane(self, slot, comp):
        """A single padded plane (device) — the fallback path's view."""
        with self.lock:
            if comp == 0:
                return self.luma[slot]
            return self.chroma[slot, comp - 1]


@functools.lru_cache(maxsize=None)
def _store_set3(shape):
    import jax
    from jax import lax

    def fn(stack, plane, slot):
        return lax.dynamic_update_index_in_dim(stack, plane, slot, 0)

    return jax.jit(fn, donate_argnums=(0,))


@functools.lru_cache(maxsize=None)
def _store_set4(shape):
    import jax
    from jax import lax

    def fn(stack, pair, slot):
        return lax.dynamic_update_index_in_dim(stack, pair, slot, 0)

    return jax.jit(fn, donate_argnums=(0,))


_STORES = {}
_STORES_LOCK = threading.Lock()


def _store_key(rec_pic, dev=None):
    ls = _padded_shape(rec_pic, 0)
    cs = _padded_shape(rec_pic, 1) \
        if rec_pic.chroma_format != k.ChromaFormat.MONOCHROME else None
    return (ls, cs, dev)


def _padded_shape(rec_pic, comp):
    h, w = rec_pic._plane_shapes[comp]
    # tile-aligned allocation: the Pallas MC kernel's HBM window DMAs
    # need plane dims on (8, 128) boundaries (tpu/pallas_mc.py); the
    # extra bottom/right margin is edge-replicated padding either way
    return (-(-(h + 64) // 8) * 8, -(-(w + 64) // 128) * 128)


def get_store(rec_pic, dev=None):
    key = _store_key(rec_pic, dev)
    with _STORES_LOCK:
        st = _STORES.get(key)
        if st is None:
            st = FrameStore(key[0], key[1], device=dev)
            _STORES[key] = st
        return st


def _slot_map(rec_pic):
    slots = getattr(rec_pic, "_dev_slots", None)
    if slots is None:
        slots = {}
        rec_pic._dev_slots = slots
    return slots


def release_slot(rec_pic):
    """Free the picture's store slots on every device (called when the
    picture buffer is recycled)."""
    slots = getattr(rec_pic, "_dev_slots", None)
    if slots:
        for store, slot, fin in slots.values():
            if fin is not None:
                fin.detach()
            store.release(slot)
        slots.clear()


def frame_store_put(rec_pic, dev_planes):
    """Register a picture's final (padded) device planes in the frame
    store of the current pin device (the GOP-across-devices decode
    pipeline keeps each picture's DPB entry on the chip that decoded
    it).  A weakref finalizer frees the slot when the picture object
    dies (sessions that end without recycling their buffers must not
    leak DPB slots)."""
    import weakref
    from ..engine import get_pin_device
    release_slot(rec_pic)
    dev = get_pin_device()
    store = get_store(rec_pic, dev)
    slot = store.put(dev_planes)
    fin = weakref.finalize(rec_pic, store.release, slot)
    _slot_map(rec_pic)[dev] = (store, slot, fin)
    return slot


def ensure_slot(rec_pic):
    """Slot for a reference picture on the CURRENT pin device.  If the
    picture was decoded on another mesh device its padded planes move
    device-to-device ONCE (the ICI reference-plane exchange of
    SURVEY.md §2.5; subsequent pictures on this device reuse the slot);
    pictures never produced on device (fallback paths, alt-rec
    rescales) upload their host padded planes."""
    import weakref
    import jax
    import jax.numpy as jnp
    from ..engine import get_pin_device
    dev = get_pin_device()
    slots = _slot_map(rec_pic)
    ent = slots.get(dev)
    if ent is not None:
        return ent[1]
    ncomp = 1 if rec_pic.chroma_format == k.ChromaFormat.MONOCHROME else 3
    src = next(iter(slots.values()), None)
    planes = {}
    if src is not None and dev is not None:
        src_store, src_slot, _ = src
        for comp in range(ncomp):
            pl = jax.device_put(src_store.plane(src_slot, comp), dev)
            dsp.STATS["d2d"] += 1
            dsp.STATS["d2d_bytes"] += pl.size * 2
            planes[comp] = pl
    else:
        for comp in range(ncomp):
            base = rec_pic.padded_plane(comp).astype(np.int16)
            th, tw = _padded_shape(rec_pic, comp)
            host = np.pad(base, ((0, th - base.shape[0]),
                                 (0, tw - base.shape[1])), mode="edge")
            planes[comp] = jnp.asarray(host) if dev is None else \
                jax.device_put(host, dev)
            dsp.STATS["uploads"] += 1
            dsp.STATS["upload_bytes"] += host.nbytes
    store = get_store(rec_pic, dev)
    slot = store.put(planes)
    fin = weakref.finalize(rec_pic, store.release, slot)
    slots[dev] = (store, slot, fin)
    return slot


def device_pad_planes(rec, planes_dev):
    """Edge-replicate padding on device: visible plane -> padded plane
    plus the (aligned) right/bottom margin for bucketed MC windows
    (the device pad_border, ref: yuv_pic.cc PadBorder)."""
    import jax.numpy as jnp
    out = {}
    for comp, pl in planes_dev.items():
        px, py = rec.pad_x[comp], rec.pad_y[comp]
        th, tw = _padded_shape(rec, comp)
        bot = th - 2 * py - pl.shape[0] + py
        rgt = tw - 2 * px - pl.shape[1] + px
        core = jnp.concatenate([
            jnp.repeat(pl[:1], py, axis=0), pl,
            jnp.repeat(pl[-1:], bot, axis=0)], axis=0)
        out[comp] = jnp.concatenate([
            jnp.repeat(core[:, :1], px, axis=1), core,
            jnp.repeat(core[:, -1:], rgt, axis=1)], axis=1)
    return out


# ---------------------------------------------------------------------------
# Eligibility
# ---------------------------------------------------------------------------

def eligible(pd, restr):
    """The flat path covers the default (unrestricted) toolset on
    4:2:0 / monochrome; LIC pictures and restricted intra toolsets fall
    back to the replay path (tpu/recon.py)."""
    if pd.lic_active:
        return False
    if pd.bitdepth > 14:
        return False
    if restr.disable_ext2_intra_67_modes:
        return False
    from ..codec.intra_search import _intra_restrictions_default
    if not _intra_restrictions_default(restr):
        return False
    if pd.chroma_format == k.ChromaFormat.MONOCHROME:
        return True
    if pd.chroma_format != k.ChromaFormat.YUV420:
        return False
    return (not restr.disable_intra_chroma_predictor and
            not restr.disable_ext2_intra_chroma_from_luma)


# ---------------------------------------------------------------------------
# Scatter kernels
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _fam_stacks(size, bitdepth, high_precision, other_dim_for_hp):
    """Stacked inverse-transform bases for all 5 families at one size,
    plus per-family shifts (mirrors dsp._matrices semantics).  Families
    that do not exist at this size stay zero (never selected)."""
    from ..ops import transform as tx
    in_rows = min(size, k.TRANSFORM_ZERO_OUT_MIN_SIZE)
    M = np.zeros((5, in_rows, size), np.int32)
    S = np.zeros((5,), np.int32)
    hp = high_precision or size >= 64 or size == 2
    for fi, tt in enumerate((k.TransformType.DCT2, k.TransformType.DCT5,
                             k.TransformType.DCT8, k.TransformType.DST1,
                             k.TransformType.DST7)):
        try:
            m, adj = tx.get_matrix(tt, size, hp)
        except KeyError:
            S[fi] = 7
            continue
        M[fi] = np.asarray(m, np.int64)[:in_rows, :].astype(np.int32)
        S[fi] = 7 + (2 if hp else 0) + adj
    return M, S


@functools.lru_cache(maxsize=None)
def make_itx_scatter_gen(width, height, bitdepth, high_precision, batch,
                         nplanes, plane_h, plane_w):
    """Merged 'gen'/'dc' dequant + inverse transform + scatter: the
    vertical/horizontal transform families are per-block DATA (indices
    into stacked basis matrices), so ONE compiled kernel per block shape
    covers every transform-select combination (ref: transform.cc
    InvGenericTransformN / fast DCT-2 paths — same math, batched
    matrix form for the MXU).  Params rows: [pidx, cy, cx, fam_v,
    fam_h]."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    in1 = min(height, k.TRANSFORM_ZERO_OUT_MIN_SIZE)
    cols = min(width, k.TRANSFORM_ZERO_OUT_MIN_SIZE)
    M1, S1 = _fam_stacks(height, bitdepth, high_precision, width)
    M2, S2 = _fam_stacks(width, bitdepth, high_precision, height)
    S2 = S2 + 13 - bitdepth  # 20 + hp-adj - bitdepth (S holds 7 + adj)
    M1j = jnp.asarray(M1)
    M2j = jnp.asarray(M2)
    S1j = jnp.asarray(S1)
    S2j = jnp.asarray(S2)

    def fn(resi, flat16, c_off, flat32, s_off, p_off):
        coeff = lax.dynamic_slice(
            flat16, (c_off,), (batch * height * width,)).reshape(
                batch, height, width)
        scale = lax.dynamic_slice(flat32, (s_off,), (batch,))
        params = lax.dynamic_slice(flat32, (p_off,),
                                   (5 * batch,)).reshape(5, batch)
        pidx, cy, cx, f1, f2 = (params[0], params[1], params[2],
                                params[3], params[4])
        dq = dsp._dequant_expr(coeff.astype(jnp.int32), scale, width,
                               height, bitdepth)
        m1 = M1j[f1]
        m2 = M2j[f2]
        s1 = S1j[f1][:, None, None]
        s2 = S2j[f2][:, None, None]
        t = dsp._clip16(
            (jnp.einsum("bji,bjk->bik", m1, dq[:, :in1, :cols],
                        preferred_element_type=jnp.int32)
             + (1 << (s1 - 1))) >> s1)
        out = dsp._clip16(
            (jnp.einsum("bij,bjk->bik", t, m2,
                        preferred_element_type=jnp.int32)
             + (1 << (s2 - 1))) >> s2)
        yy = cy[:, None] + jnp.arange(height)[None, :]
        xx = cx[:, None] + jnp.arange(width)[None, :]
        return resi.at[pidx[:, None, None], yy[:, :, None],
                       xx[:, None, :]].set(out.astype(jnp.int32),
                                           mode="drop")

    return jax.jit(fn, donate_argnums=(0,))


@functools.lru_cache(maxsize=None)
def make_itx_scatter(width, height, bitdepth, txv, txh, variant,
                     high_precision, batch, nplanes, plane_h, plane_w):
    """Fused dequant + inverse transform + scatter into the (nplanes,
    H, W) int32 residual plane (donated).  Padding jobs carry cy=_BIG
    so their updates are dropped."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def fn(resi, flat16, c_off, flat32, s_off, p_off):
        coeff = lax.dynamic_slice(
            flat16, (c_off,), (batch * height * width,)).reshape(
                batch, height, width)
        scale = lax.dynamic_slice(flat32, (s_off,), (batch,))
        params = lax.dynamic_slice(flat32, (p_off,),
                                   (3 * batch,)).reshape(3, batch)
        out = dsp._itx_core(coeff, scale, width, height, bitdepth, txv,
                            txh, variant, high_precision)
        pidx, cy, cx = params[0], params[1], params[2]
        yy = cy[:, None] + jnp.arange(height)[None, :]
        xx = cx[:, None] + jnp.arange(width)[None, :]
        return resi.at[pidx[:, None, None], yy[:, :, None],
                       xx[:, None, :]].set(out.astype(jnp.int32),
                                           mode="drop")

    return jax.jit(fn, donate_argnums=(0,))


@functools.lru_cache(maxsize=None)
def make_mc_scatter(wb, hb, luma, bitdepth, high_prec, short_out, batch,
                    plane_h, plane_w, nplanes):
    """Batched sub-pel MC from the frame-store superstack + scatter of
    the (valid w×h region of the) predictions into the (2*nplanes, H,
    W) int16 prediction planes (chan = dslot*nplanes + plane), donated.
    Only slot-1 jobs (second half of a bi-pred pair; short groups only)
    additionally mark the (nplanes, H, W) bi-coverage mask — pixels
    never written at all are later overwritten by the intra scan, so no
    'written' mask is needed (the scan's availability gating never
    reads undecoded samples, ref: intra_prediction.cc:707-848).
    Params rows: [stack_idx, ypad, xpad, fx, fy, chan, cy, cx, w, h]."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    taps = 8 if luma else 4
    use_pallas = False
    from ..engine import use_pallas_mc
    if use_pallas_mc() and luma and min(wb, hb) >= 8:
        # the Pallas window-DMA kernel needs tile-aligned plane dims and
        # room for one aligned superset window (6-8x the XLA gather on
        # chip, bit-exact; tpu/pallas_mc.py).  Only the luma >=8 block
        # buckets take it: they carry most of the MC pixels, and each
        # (shape, variant) costs one Mosaic compile (persisted in the
        # jit_cached compile cache).
        whp = -(-(hb + taps - 1 + 7) // 8) * 8
        wwp = -(-(wb + taps - 1 + 127) // 128) * 128
        use_pallas = (plane_h % 8 == 0 and plane_w % 128 == 0 and
                      plane_h >= whp and plane_w >= wwp)
    if use_pallas:
        from .pallas_mc import mc_pallas_direct
        pcore = mc_pallas_direct(wb, hb, luma, bitdepth, high_prec,
                                 short_out, group=16)
        core = lambda planes, r, y, x, fx, fy: pcore(
            planes, jnp.stack([r, y, x, fx, fy]))
    else:
        core = dsp._mc_core_builder(wb, hb, luma, bitdepth, high_prec,
                                    short_out)

    def fn(pred, mask, planes, flat32, p_off):
        pm = lax.dynamic_slice(flat32, (p_off,),
                               (10 * batch,)).reshape(10, batch)
        ridx, y0, x0, fx, fy = pm[0], pm[1], pm[2], pm[3], pm[4]
        chan, cy, cx, w, h = pm[5], pm[6], pm[7], pm[8], pm[9]
        out = core(planes, ridx, y0, x0, fx, fy)
        ar_h = jnp.arange(hb)
        ar_w = jnp.arange(wb)
        yy = jnp.where(ar_h[None, :] < h[:, None],
                       cy[:, None] + ar_h[None, :], _BIG)
        xx = jnp.where(ar_w[None, :] < w[:, None],
                       cx[:, None] + ar_w[None, :], _BIG)
        idx = (chan[:, None, None], yy[:, :, None], xx[:, None, :])
        pred = pred.at[idx].set(out, mode="drop")
        if short_out:
            # slot-1 jobs mark the bi mask; slot-0 lanes are dropped
            mchan = jnp.where(chan >= nplanes, chan - nplanes, _BIG)
            midx = (mchan[:, None, None], yy[:, :, None],
                    xx[:, None, :])
            mask = mask.at[midx].add(jnp.ones_like(out), mode="drop")
        return pred, mask

    return jax.jit(fn, donate_argnums=(0, 1))


@functools.lru_cache(maxsize=None)
def make_combine(nplanes, H, W, ph, pw, bitdepth):
    """Inter reconstruction on device: per pixel select uni (slot-0
    prediction is final samples) or bi (both slots are 14-bit
    intermediates -> AddAvg, ref: inter_prediction.cc AddAvg), add the
    residual, clip, and place into the zero-padded scan canvas
    (intra_scan.plane_pad geometry).  Returns (padded plane int16,
    padded residual int32), leading dim nplanes (1 luma / 2 chroma)."""
    import jax
    import jax.numpy as jnp
    shift = max(2, mc.INTERNAL_PRECISION - bitdepth) + 1
    offset = (1 << (shift - 1)) + 2 * mc.INTERNAL_OFFSET
    max_val = (1 << bitdepth) - 1
    pt = intra_scan.PAD_TL

    def fn(pred, mask, resi):
        # pred channel layout: slot0 planes first then slot1
        # (chan = dslot * nplanes + plane); mask = bi coverage only
        p0 = pred[:nplanes].astype(jnp.int32)
        p1 = pred[nplanes:].astype(jnp.int32)
        bi = mask > 0
        avg = jnp.clip((p0 + p1 + offset) >> shift, 0, max_val)
        base = jnp.where(bi, avg, p0)
        vis = jnp.clip(base + resi, 0, max_val).astype(jnp.int16)
        canvas = jnp.zeros((nplanes, ph, pw), jnp.int16)
        canvas = canvas.at[:, pt:pt + H, pt:pt + W].set(vis)
        rcanvas = jnp.zeros((nplanes, ph, pw), jnp.int32)
        rcanvas = rcanvas.at[:, pt:pt + H, pt:pt + W].set(resi)
        return canvas, rcanvas

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Vectorized job builders (numpy over the record table)
# ---------------------------------------------------------------------------

def _pad_canvas_dims(h, w):
    ph = -(-(h + intra_scan.PAD_TL + intra_scan.PAD_BR) // 128) * 128
    pw = -(-(w + intra_scan.PAD_TL + intra_scan.PAD_BR) // 128) * 128
    return ph, pw


def _bucket(n):
    b = 8
    while b < n:
        b <<= 1
    return b


_VAR_NAMES = {0: "gen", 1: "dst4", 2: "dc", 3: "skip"}


class FlatReconstructor:
    def __init__(self, pic_decoder, segment, qp):
        self.pdec = pic_decoder
        self.pd = pic_decoder.pic_data
        self.rec = pic_decoder.rec_pic
        self.restr = segment.restrictions
        self.segment = segment
        self.bitdepth = self.pd.bitdepth
        self.hp_tx = not self.restr.disable_ext2_transform_high_precision
        self.hp_mv = not self.restr.disable_ext2_inter_high_precision_mv
        self.mono = self.pd.chroma_format == k.ChromaFormat.MONOCHROME

    # ------------------------------------------------------------------
    def run(self):
        """Full device reconstruction + deblock handoff.  Fills the host
        rec planes (single download) before returning."""
        import jax.numpy as jnp
        from ..profiling import span
        pd = self.pd
        rec_arr = pd._parse_records
        leaves = rec_arr[rec_arr[:, C_SPLIT] == 0]
        # pool-slot order is allocation order; the scans need decode
        # (z-)order, exported by the native derive walk (r[70])
        leaves = leaves[np.argsort(leaves[:, C_ORDER], kind="stable")]
        self.leaves = leaves
        H, W = pd.height, pd.width
        Hc, Wc = self.rec.height[1], self.rec.width[1]
        ph, pw = _pad_canvas_dims(H, W)
        phc, pwc = _pad_canvas_dims(Hc, Wc) if not self.mono else (0, 0)

        with span("flat.build"):
            itx_groups = self._build_itx_groups(leaves)
            mc_groups, have_inter = self._build_mc_groups(leaves)
            lmeta, cmeta = self._build_intra_meta(leaves)
            batch = dsp.DevBatch()
            itx_prep = [(key, batch.add(c), batch.add(s), batch.add(p))
                        for key, c, s, p in itx_groups]
            mc_prep = [(key, batch.add(p)) for key, p in mc_groups]
            if lmeta is not None:
                h_lmeta = batch.add(lmeta)
            if cmeta is not None:
                h_cmeta = batch.add(cmeta)
        with span("flat.upload"):
            batch.upload()

        # XVC_FLAT_SYNC=1: block after each stage so the profile
        # attributes device time to the op that spent it (CPU backend
        # dispatch is async; costs otherwise pool at the next fence)
        import os as _os
        import time as _time
        _sync_on = _os.environ.get("XVC_FLAT_SYNC") == "1"

        def _sync(x, name):
            if _sync_on:
                import jax as _jax
                from ..profiling import add_span_time
                t0 = _time.perf_counter()
                _jax.block_until_ready(x)
                add_span_time("flat.sync." + name,
                              _time.perf_counter() - t0)

        with span("flat.dispatch"):
            # residual planes
            resi_l = jnp.zeros((1, H, W), jnp.int32)
            resi_c = jnp.zeros((2, Hc, Wc), jnp.int32) if not self.mono \
                else None
            for (wc, hc, txv, txh, var, is_chroma), hc_, hs_, hp_ in \
                    itx_prep:
                nplanes = 2 if is_chroma else 1
                tgt_h, tgt_w = (Hc, Wc) if is_chroma else (H, W)
                if var == 0:
                    fn = make_itx_scatter_gen(
                        wc, hc, self.bitdepth, self.hp_tx,
                        hc_[3] // (wc * hc), nplanes, tgt_h, tgt_w)
                else:
                    fn = make_itx_scatter(wc, hc, self.bitdepth, txv,
                                          txh, _VAR_NAMES[var],
                                          self.hp_tx,
                                          hc_[3] // (wc * hc), nplanes,
                                          tgt_h, tgt_w)
                f16, c_off = batch.flat(hc_)
                f32, s_off = batch.flat(hs_)
                _, p_off = batch.flat(hp_)
                dsp.STATS["dispatches"] += 1
                if is_chroma:
                    resi_c = fn(resi_c, f16, c_off, f32, s_off, p_off)
                else:
                    resi_l = fn(resi_l, f16, c_off, f32, s_off, p_off)
            _sync((resi_l, resi_c), "itx")

            # prediction planes + coverage masks; channel layout
            # chan = dslot * nplanes + plane (slot-0 planes first)
            pred_l = jnp.zeros((2, H, W), jnp.int16)
            mask_l = jnp.zeros((1, H, W), jnp.int16)
            if not self.mono:
                pred_c = jnp.zeros((4, Hc, Wc), jnp.int16)
                mask_c = jnp.zeros((2, Hc, Wc), jnp.int16)
            if have_inter:
                from ..engine import get_pin_device
                store = get_store(self.rec, get_pin_device())
                # the lock is held across the dispatches so a concurrent
                # donated store update (another pipeline worker) cannot
                # invalidate the superstack reference mid-launch
                with store.lock:
                    luma_stack = store.luma
                    chroma_stack = None if self.mono else \
                        store.chroma.reshape(
                            (-1,) + store.chroma_shape)
                    for (wb, hb, luma, short), hp_ in mc_prep:
                        fn = make_mc_scatter(
                            wb, hb, luma, self.bitdepth, self.hp_mv,
                            short, hp_[3] // 10,
                            H if luma else Hc, W if luma else Wc,
                            1 if luma else 2)
                        f32, p_off = batch.flat(hp_)
                        dsp.STATS["dispatches"] += 1
                        if luma:
                            pred_l, mask_l = fn(pred_l, mask_l,
                                                luma_stack, f32, p_off)
                        else:
                            pred_c, mask_c = fn(pred_c, mask_c,
                                                chroma_stack, f32, p_off)
            _sync((pred_l, mask_l), "mc")

            # inter reconstruction + scan canvases
            comb_l = make_combine(1, H, W, ph, pw, self.bitdepth)
            plane_l, rpad_l = comb_l(pred_l, mask_l, resi_l)
            plane_l = plane_l[0]
            rpad_l = rpad_l[0]
            if not self.mono:
                comb_c = make_combine(2, Hc, Wc, phc, pwc, self.bitdepth)
                plane_c, rpad_c = comb_c(pred_c, mask_c, resi_c)
            _sync(plane_l, "combine")

        # intra scans (decode-order lax.scan; reads/writes the canvases)
        if lmeta is not None:
            with span("flat.intra_scan"):
                fn = intra_scan.make_intra_scan(ph, pw, self.bitdepth)
                f32, m_off = batch.flat(h_lmeta)
                meta_dev = dsp._slicer(h_lmeta[3], tuple(h_lmeta[2]),
                                       "int32")(f32, m_off)
                plane_l = fn(plane_l, rpad_l, meta_dev)
                _sync(plane_l, "lscan")
        if cmeta is not None:
            with span("flat.chroma_scan"):
                fn = intra_scan.make_intra_chroma_scan(
                    phc, pwc, ph, pw, self.bitdepth)
                f32, m_off = batch.flat(h_cmeta)
                meta_dev = dsp._slicer(h_cmeta[3], tuple(h_cmeta[2]),
                                       "int32")(f32, m_off)
                plane_c = fn(plane_c, rpad_c, plane_l, meta_dev)
                _sync(plane_c, "cscan")

        # visible device planes
        pt = intra_scan.PAD_TL
        planes_dev = {0: plane_l[pt:pt + H, pt:pt + W]}
        if not self.mono:
            planes_dev[1] = plane_c[0, pt:pt + Hc, pt:pt + Wc]
            planes_dev[2] = plane_c[1, pt:pt + Hc, pt:pt + Wc]

        from . import recon as recon_mod
        recon_mod.LAST_TAIL_BLOCKS = 0
        if pd.deblock:
            # the deblock stage consumes the device planes, stores the
            # padded result in the frame store and downloads the final
            # picture into the host rec planes
            self.rec._dev_pre_deblock = planes_dev
            return
        with span("flat.store"):
            padded = device_pad_planes(self.rec, planes_dev)
            frame_store_put(self.rec, padded)
        with span("flat.download"):
            flat, offs = dsp.gather_flat(
                [planes_dev[c] for c in sorted(planes_dev)])
        for comp in sorted(planes_dev):
            off, shape = offs[comp]
            self.rec.plane_view(comp)[:] = \
                flat[off:off + int(np.prod(shape))].reshape(shape)

    # ------------------------------------------------------------------
    def _qp_scales(self, qp_raw, comp):
        """Vectorized Qp.get_inv_scale over per-leaf raw qps."""
        cache = self._qp_cache if hasattr(self, "_qp_cache") else {}
        self._qp_cache = cache
        uq = np.unique(qp_raw)
        out = np.empty(qp_raw.shape, np.int64)
        for q in uq:
            key = (int(q), comp)
            if key not in cache:
                qo = Qp(int(q), self.pd.chroma_format, self.bitdepth, 0.0,
                        self.segment.chroma_qp_offset_table,
                        self.segment.chroma_qp_offset_u,
                        self.segment.chroma_qp_offset_v)
                cache[key] = qo.get_inv_scale(comp)
            out[qp_raw == q] = cache[key]
        return out

    def _build_itx_groups(self, leaves):
        """Group coded blocks by (w, h, txv, txh, variant, chroma) and
        gather their coefficients from the flat arena (vectorized twin
        of recon.py _add_itx_job)."""
        pd = self.pd
        coeff = pd._parse_coeff
        DEFAULT = int(k.TransformType.DEFAULT)
        DCT2 = int(k.TransformType.DCT2)
        no_dst = self.restr.disable_ext2_transform_dst
        sx, sy = pd.chroma_shift_x, pd.chroma_shift_y
        groups = []
        ncomp = 1 if self.mono else 3
        for comp in range(ncomp):
            sel = leaves[(leaves[:, C_CBF0 + comp] != 0) &
                         (leaves[:, C_COEFF0 + comp] >= 0)]
            if not len(sel):
                continue
            if comp == 0:
                cx, cy = sel[:, C_X], sel[:, C_Y]
                w, h = sel[:, C_W], sel[:, C_H]
                t0, t1 = sel[:, C_TT00], sel[:, C_TT01]
            else:
                cx, cy = sel[:, C_X] >> sx, sel[:, C_Y] >> sy
                w, h = sel[:, C_W] >> sx, sel[:, C_H] >> sy
                t0, t1 = sel[:, C_TT10], sel[:, C_TT11]
            scale = self._qp_scales(sel[:, C_QP], comp)
            wl2 = np.int64(np.log2(w))
            hl2 = np.int64(np.log2(h))
            bias = ((wl2 + 1 + hl2 + 1) % 2) != 0
            scale = np.where(bias, scale * 181, scale)
            tskip = sel[:, C_TSKIP0 + comp] != 0
            dst4 = ((comp == 0) & (sel[:, C_PRED] == 0) &
                    (t0 == DEFAULT) & (t1 == DEFAULT) &
                    (w == 4) & (h == 4) & (not no_dst))
            dflt = ((t0 == DEFAULT) | (t0 == DCT2)) & \
                   ((t1 == DEFAULT) | (t1 == DCT2))
            dc = (sel[:, C_DCONLY0 + comp] != 0) & dflt
            # dc-only blocks run through the merged gen kernel (same
            # exact result: the dc fast path is a shortcut of the full
            # DCT-2, ref: transform.cc:115-121); the per-block transform
            # family is data, so 'gen' needs ONE group per block shape
            var = np.where(tskip, 3, np.where(dst4, 1, 0))
            fam1 = np.maximum(t0, 1) - 1  # DEFAULT->DCT2 family index
            fam2 = np.maximum(t1, 1) - 1
            keys = np.stack([w, h, var], axis=1)
            uniq, inv = np.unique(keys, axis=0, return_inverse=True)
            offs_all = sel[:, C_COEFF0 + comp]
            for gi, (gw, gh, gv) in enumerate(uniq):
                m = inv == gi
                b = int(m.sum())
                bp = dsp.pad_pow2(b)
                offs = offs_all[m]
                idx = offs[:, None] + np.arange(gw * gh)[None, :]
                cf = np.zeros((bp, gh, gw), np.int16)
                cf[:b] = coeff[idx].astype(np.int16).reshape(b, gh, gw)
                scales = np.zeros((bp,), np.int32)
                scales[:b] = scale[m]
                nrows = 5 if gv == 0 else 3
                params = np.full((nrows, bp), _BIG, np.int32)
                params[0, :b] = 0 if comp == 0 else comp - 1
                params[1, :b] = cy[m]
                params[2, :b] = cx[m]
                if gv == 0:
                    params[3, :b] = fam1[m]
                    params[4, :b] = fam2[m]
                    params[3, b:] = 0  # padding lanes: valid fam index
                    params[4, b:] = 0
                groups.append(((int(gw), int(gh), 0, 0, int(gv),
                                comp > 0), cf, scales, params))
        return groups

    # ------------------------------------------------------------------
    def _ref_tables(self):
        """Per (list, ref_idx): frame-store slot + ref luma dims."""
        rpl = self.pd.ref_pic_lists
        slots = np.zeros((2, 5), np.int32)
        refw = np.zeros((2, 5), np.int32)
        refh = np.zeros((2, 5), np.int32)
        for lst in range(2):
            n = rpl.get_num_ref_pics(lst)
            for i in range(min(n, 5)):
                entry = rpl.entries[lst][i]
                slots[lst, i] = ensure_slot(entry.rec_pic)
                refw[lst, i] = entry.rec_pic.width[0]
                refh[lst, i] = entry.rec_pic.height[0]
        return slots, refw, refh

    def _build_mc_groups(self, leaves):
        """Vectorized MC job emission (twin of recon.py _add_mc_jobs /
        _emit_mc): returns [(key, params (10, B) int32)], key =
        (wb, hb, luma, short)."""
        pd = self.pd
        inter = leaves[(leaves[:, C_TREE] == 0) & (leaves[:, C_PRED] == 1)]
        if not len(inter):
            return [], False
        slots, refw, refh = self._ref_tables()
        BI = int(k.InterDir.BI)
        L1 = int(k.InterDir.L1)
        rows = []  # (comp, slot_store, ypad, xpad, fx, fy, dslot,
        #             cy, cx, w, h) appended as arrays
        normal = inter[inter[:, C_AFFINE] == 0]
        affine = inter[inter[:, C_AFFINE] != 0]
        ncomp = 1 if self.mono else 3
        for dslot in (0, 1):
            if dslot == 0:
                sel = normal
                lst = np.where(sel[:, C_DIR] == L1, 1, 0)
            else:
                sel = normal[normal[:, C_DIR] == BI]
                lst = np.ones(len(sel), np.int64)
            if not len(sel):
                continue
            short = (sel[:, C_DIR] == BI)
            ridx = sel[np.arange(len(sel)), C_REF0 + lst]
            mvx = sel[np.arange(len(sel)), C_MV + 8 * lst]
            mvy = sel[np.arange(len(sel)), C_MV + 8 * lst + 1]
            # clip_mv (ref: inter_prediction.cc:769-782)
            sh = mv_mod.MV_PRECISION_SHIFT
            posx, posy = sel[:, C_X], sel[:, C_Y]
            rw = refw[lst, ridx]
            rh = refh[lst, ridx]
            mvx = np.clip(mvx, -((k.MAX_BLOCK_SIZE + 8 + posx - 1) << sh),
                          (rw + 8 - posx - 1) << sh)
            mvy = np.clip(mvy, -((k.MAX_BLOCK_SIZE + 8 + posy - 1) << sh),
                          (rh + 8 - posy - 1) << sh)
            sslot = slots[lst, ridx]
            for comp in range(ncomp):
                self._emit_mc_rows(rows, sel, comp, sslot, mvx, mvy,
                                   short, dslot)
        for r in affine:
            self._emit_affine_rows(rows, r, slots, refw, refh, ncomp)
        if not rows:
            return [], False
        allrows = np.concatenate(rows, axis=1)  # (12, N) incl. key cols
        # key cols: 0 luma flag, 1 short, then wb, hb

        def buck(v):
            return np.where(v <= 8, 8, np.where(v <= 16, 16,
                            np.where(v <= 32, 32, 64)))

        wb = buck(allrows[10])
        hb = buck(allrows[11])
        keys = np.stack([allrows[0], allrows[1], wb, hb], axis=1)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        groups = []
        for gi, (luma, short, gwb, ghb) in enumerate(uniq):
            m = inv == gi
            b = int(m.sum())
            bp = dsp.pad_pow2(b)
            params = np.full((10, bp), _BIG, np.int32)
            params[:, :b] = allrows[2:12, m].astype(np.int32)
            # order: stack_idx, ypad, xpad, fx, fy, dslot, cy, cx, w, h
            groups.append(((int(gwb), int(ghb), bool(luma), bool(short)),
                           params))
        return groups, True

    def _emit_mc_rows(self, rows, sel, comp, sslot, mvx, mvy, short,
                      dslot):
        """Fullpel/frac split + window origin for one component
        (ref: inter_prediction.cc:1174-1205 GetFullpelRef)."""
        pd = self.pd
        rec = self.rec
        sx = rec.shift_x[comp]
        sy = rec.shift_y[comp]
        shift_x = mv_mod.MV_PRECISION_SHIFT + sx
        shift_y = mv_mod.MV_PRECISION_SHIFT + sy
        if comp == 0:
            pel_x = mvx >> shift_x
            pel_y = mvy >> shift_y
            fx = mvx & ((1 << shift_x) - 1)
            fy = mvy & ((1 << shift_y) - 1)
        elif self.restr.disable_inter_chroma_subpel:
            pel_x = (mvx + (1 << (shift_x - 1))) >> shift_x
            pel_y = (mvy + (1 << (shift_y - 1))) >> shift_y
            fx = np.zeros_like(mvx)
            fy = np.zeros_like(mvy)
        else:
            pel_x = mvx >> shift_x
            pel_y = mvy >> shift_y
            fx = (mvx & ((1 << shift_x) - 1)) << (1 - sx)
            fy = (mvy & ((1 << shift_y) - 1)) << (1 - sy)
        if not self.hp_mv:
            fx = fx >> mv_mod.HIGH_TO_NORMAL_DELTA
            fy = fy >> mv_mod.HIGH_TO_NORMAL_DELTA
        cx = sel[:, C_X] >> sx
        cy = sel[:, C_Y] >> sy
        w = sel[:, C_W] >> sx
        h = sel[:, C_H] >> sy
        luma = comp == 0
        taps = mc.NUM_TAPS_LUMA if luma else mc.NUM_TAPS_CHROMA
        half = taps // 2 - 1
        # chroma superstack is reshaped (S*2, Hp, Wp): stack idx carries
        # the uv plane; scatter channel = dslot * nplanes + plane
        stack_idx = sslot if luma else sslot * 2 + (comp - 1)
        chan = dslot if luma else dslot * 2 + (comp - 1)
        ypad = rec.pad_y[comp] + cy + pel_y - half
        xpad = rec.pad_x[comp] + cx + pel_x - half
        n = len(sel)
        rows.append(np.stack([
            np.full(n, 1 if luma else 0), short.astype(np.int64),
            stack_idx, ypad, xpad, fx, fy,
            np.full(n, chan), cy, cx, w, h]).astype(np.int64))

    def _emit_affine_rows(self, rows, r, slots, refw, refh, ncomp):
        """Affine subblock expansion for one CU (exact twin of
        inter_mc.affine_subblock_jobs, ref: inter_prediction.cc:
        1044-1136), emitted straight from the record row."""
        pd = self.pd
        rec = self.rec
        BI = int(k.InterDir.BI)
        L1 = int(k.InterDir.L1)
        d = int(r[C_DIR])
        lists = [(0 if d != L1 else 1, d == BI)]
        if d == BI:
            lists = [(0, True), (1, True)]
        posx, posy = int(r[C_X]), int(r[C_Y])
        width, height = int(r[C_W]), int(r[C_H])
        sh = mv_mod.MV_PRECISION_SHIFT
        mv_scale = 1 << sh
        for dslot, (lst, short) in enumerate(lists):
            ridx = int(r[C_REF0 + lst])
            rw, rh = int(refw[lst, ridx]), int(refh[lst, ridx])
            sslot = int(slots[lst, ridx])

            def clip(mvp):
                x = min(max(mvp[0],
                            -((k.MAX_BLOCK_SIZE + 8 + posx - 1) << sh)),
                        (rw + 8 - posx - 1) << sh)
                y = min(max(mvp[1],
                            -((k.MAX_BLOCK_SIZE + 8 + posy - 1) << sh)),
                        (rh + 8 - posy - 1) << sh)
                return (x, y)

            mv3 = [clip((int(r[C_MV + 8 * lst + 2 * c]),
                         int(r[C_MV + 8 * lst + 2 * c + 1])))
                   for c in range(3)]
            for comp in range(ncomp):
                sx = rec.shift_x[comp]
                sy = rec.shift_y[comp]
                cw, ch = width >> sx, height >> sy
                ccx, ccy = posx >> sx, posy >> sy
                if mv3[0] == mv3[1]:
                    # uniform: plain MC with mv3[0]
                    self._affine_plain(rows, comp, sslot, mv3[0], short,
                                       dslot, ccx, ccy, cw, ch)
                    continue
                jobs, sw, shh = self._affine_subblocks(
                    mv3, comp, posx, posy, cw, ch, sx, sy)
                luma = comp == 0
                taps = mc.NUM_TAPS_LUMA if luma else mc.NUM_TAPS_CHROMA
                half = taps // 2 - 1
                stack_idx = sslot if luma else sslot * 2 + (comp - 1)
                chan = dslot if luma else dslot * 2 + (comp - 1)
                arr = np.asarray(jobs, np.int64).T  # (6, J)
                x0, y0, fx, fy, dx, dy = arr
                n = arr.shape[1]
                rows.append(np.stack([
                    np.full(n, 1 if luma else 0),
                    np.full(n, 1 if short else 0),
                    np.full(n, stack_idx),
                    rec.pad_y[comp] + y0 - half,
                    rec.pad_x[comp] + x0 - half,
                    fx, fy, np.full(n, chan),
                    ccy + dy, ccx + dx,
                    np.full(n, sw), np.full(n, shh)]).astype(np.int64))

    def _affine_plain(self, rows, comp, sslot, mv, short, dslot, ccx,
                      ccy, cw, ch):
        rec = self.rec
        sx, sy = rec.shift_x[comp], rec.shift_y[comp]
        shift_x = mv_mod.MV_PRECISION_SHIFT + sx
        shift_y = mv_mod.MV_PRECISION_SHIFT + sy
        mvx, mvy = mv
        if comp == 0:
            pel_x, pel_y = mvx >> shift_x, mvy >> shift_y
            fx = mvx & ((1 << shift_x) - 1)
            fy = mvy & ((1 << shift_y) - 1)
        elif self.restr.disable_inter_chroma_subpel:
            pel_x = (mvx + (1 << (shift_x - 1))) >> shift_x
            pel_y = (mvy + (1 << (shift_y - 1))) >> shift_y
            fx = fy = 0
        else:
            pel_x, pel_y = mvx >> shift_x, mvy >> shift_y
            fx = (mvx & ((1 << shift_x) - 1)) << (1 - sx)
            fy = (mvy & ((1 << shift_y) - 1)) << (1 - sy)
        if not self.hp_mv:
            fx >>= mv_mod.HIGH_TO_NORMAL_DELTA
            fy >>= mv_mod.HIGH_TO_NORMAL_DELTA
        luma = comp == 0
        taps = mc.NUM_TAPS_LUMA if luma else mc.NUM_TAPS_CHROMA
        half = taps // 2 - 1
        stack_idx = sslot if luma else sslot * 2 + (comp - 1)
        chan = dslot if luma else dslot * 2 + (comp - 1)
        rows.append(np.asarray(
            [[1 if luma else 0], [1 if short else 0], [stack_idx],
             [rec.pad_y[comp] + ccy + pel_y - half],
             [rec.pad_x[comp] + ccx + pel_x - half],
             [fx], [fy], [chan], [ccy], [ccx], [cw], [ch]], np.int64))

    def _affine_subblocks(self, mv, comp, posx, posy, width, height,
                          scale_x, scale_y):
        """Subblock job list (x0, y0, fx, fy, dx, dy) in component
        coords; mv are the three clipped corner MVs."""
        AFFINE_PREC = 8
        sh = mv_mod.MV_PRECISION_SHIFT
        mv_scale = 1 << sh
        mv_shift_x = sh + scale_x
        mv_shift_y = sh + scale_y

        def get_subblock_size(ref, mv_uni, size, scale):
            MIN_SUBBLOCK = 4
            SIZE_SHIFT = 6 - sh
            max_len = max(abs(mv_uni[0] - ref[0]), abs(mv_uni[1] - ref[1]))
            if not max_len:
                return size
            sub = max(1, (size >> SIZE_SHIFT) // max_len)
            while size % sub:
                sub -= 1
            return max(MIN_SUBBLOCK, sub) >> scale

        sw = get_subblock_size(mv[0], mv[1], width, scale_x)
        shh = get_subblock_size(mv[0], mv[2], height, scale_y)
        luma_w, luma_h = self.pd.width, self.pd.height
        mv_max_x = (luma_w - posx + 8 - 1) * mv_scale
        mv_min_x = (-k.MAX_BLOCK_SIZE - posx - 8 + 1) * mv_scale
        mv_max_y = (luma_h - posy + 8 - 1) * mv_scale
        mv_min_y = (-k.MAX_BLOCK_SIZE - posy - 8 + 1) * mv_scale

        def trunc_div(a, b):
            q = abs(a) // b
            return -q if a < 0 else q

        delta_hor_x = trunc_div((mv[1][0] - mv[0][0]) * (1 << AFFINE_PREC),
                                width)
        delta_hor_y = trunc_div((mv[1][1] - mv[0][1]) * (1 << AFFINE_PREC),
                                width)
        delta_ver_x = -delta_hor_y
        delta_ver_y = delta_hor_x
        hor_x = mv[0][0] * (1 << AFFINE_PREC)
        hor_y = mv[0][1] * (1 << AFFINE_PREC)
        ver_x, ver_y = hor_x, hor_y
        ccx, ccy = posx >> scale_x, posy >> scale_y
        jobs = []
        for sub_y in range(0, height, shh):
            for sub_x in range(0, width, sw):
                mv_x = min(max((hor_x + delta_hor_x * (sw >> 1) +
                                delta_ver_x * (shh >> 1)) >> AFFINE_PREC,
                               mv_min_x), mv_max_x)
                mv_y = min(max((hor_y + delta_hor_y * (sw >> 1) +
                                delta_ver_y * (shh >> 1)) >> AFFINE_PREC,
                               mv_min_y), mv_max_y)
                x0 = ccx + sub_x + (mv_x >> mv_shift_x)
                y0 = ccy + sub_y + (mv_y >> mv_shift_y)
                jobs.append((x0, y0, mv_x & ((1 << mv_shift_x) - 1),
                             mv_y & ((1 << mv_shift_y) - 1), sub_x, sub_y))
                hor_x += delta_hor_x * sw
                hor_y += delta_hor_y * sw
            ver_x += delta_ver_x * shh
            ver_y += delta_ver_y * shh
            hor_x, hor_y = ver_x, ver_y
        return jobs, sw, shh

    # ------------------------------------------------------------------
    def _build_intra_meta(self, leaves):
        """Luma + chroma scan metadata straight from the records (the
        decode-order availability sbl/sar is exported by the native
        derive walk, xvcn_pic.inc parse_derive_cu)."""
        pd = self.pd
        lsel = leaves[(leaves[:, C_TREE] == 0) & (leaves[:, C_PRED] == 0)]
        lmeta = None
        if len(lsel):
            n = len(lsel)
            np2 = dsp.pad_pow2(n)
            lmeta = np.zeros((np2, intra_scan.META_COLS), np.int32)
            has_l = (lsel[:, C_X] > 0).astype(np.int32)
            has_a = (lsel[:, C_Y] > 0).astype(np.int32)
            lmeta[:n] = np.stack([
                lsel[:, C_X], lsel[:, C_Y], lsel[:, C_W], lsel[:, C_H],
                lsel[:, C_IML], has_l, has_a, has_l & has_a,
                np.clip(lsel[:, C_SBL], 0, 64),
                np.clip(lsel[:, C_SAR], 0, 64),
                np.ones(n, np.int64)], axis=1).astype(np.int32)
        if self.mono:
            return lmeta, None
        dual = pd.has_secondary_cu_tree()
        ctree = 1 if dual else 0
        csel = leaves[leaves[:, C_TREE] == ctree]
        if not dual:
            csel = csel[csel[:, C_PRED] == 0]
        if not len(csel):
            return lmeta, None
        # resolve DM to the co-located primary-tree luma mode
        cmode = csel[:, C_IMC].copy()
        dm = cmode == k.INTRA_CHROMA_DM
        if dm.any():
            if dual:
                map_w = (pd.width + 3) >> 2
                map_h = (pd.height + 3) >> 2
                lmap = np.zeros((map_h, map_w), np.int32)
                for r in lsel:
                    x0, y0 = int(r[C_X]) >> 2, int(r[C_Y]) >> 2
                    x1 = min(map_w, (int(r[C_X]) + int(r[C_W]) + 3) >> 2)
                    y1 = min(map_h, (int(r[C_Y]) + int(r[C_H]) + 3) >> 2)
                    lmap[y0:y1, x0:x1] = r[C_IML]
                cmode[dm] = lmap[csel[dm, C_Y] >> 2, csel[dm, C_X] >> 2]
            else:
                cmode[dm] = csel[dm, C_IML]
        is_lm = (csel[:, C_IMC] == k.INTRA_MODE_LM_CHROMA).astype(np.int32)
        sx, sy = pd.chroma_shift_x, pd.chroma_shift_y
        csh = max(sx, sy)
        ccx = csel[:, C_X] >> sx
        ccy = csel[:, C_Y] >> sy
        has_l = (ccx > 0).astype(np.int32)
        has_a = (ccy > 0).astype(np.int32)
        n = len(csel)
        base = np.stack([
            ccx, ccy, csel[:, C_W] >> sx, csel[:, C_H] >> sy,
            np.maximum(cmode, 0), is_lm, has_l, has_a, has_l & has_a,
            np.clip(csel[:, C_SBL], 0, 64) >> csh,
            np.clip(csel[:, C_SAR], 0, 64) >> csh,
            np.ones(n, np.int64)], axis=1).astype(np.int32)
        # one row per (leaf, uv) in the host decode order (u then v)
        rows = np.zeros((2 * n, intra_scan.CMETA_COLS), np.int32)
        rows[0::2, 0] = 0
        rows[1::2, 0] = 1
        rows[0::2, 1:] = base
        rows[1::2, 1:] = base
        np2 = dsp.pad_pow2(2 * n)
        cmeta = np.zeros((np2, intra_scan.CMETA_COLS), np.int32)
        cmeta[:2 * n] = rows
        return lmeta, cmeta


def reconstruct(pic_decoder, segment, qp):
    """Entry point: run the flat device reconstruction for one parsed
    picture (records already exported by native parse_picture)."""
    FlatReconstructor(pic_decoder, segment, qp).run()
