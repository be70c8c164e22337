"""Native full-picture decode driver.

Wires xvcn_decode_picture (xvcn_pic.inc) into the Python session layer:
one call per picture runs the whole CABAC parse, MV derivation,
reconstruction and deblocking in C++ (the performance role of the
reference's compiled decoder, ref: src/xvc_dec_lib/cu_decoder.cc:47-138).
The Python CU path remains the validation twin (XVC_NATIVE=0 or
XVC_DSP=jax).

Cross-picture TMVP state is carried by a per-4x4 "motion field" exported
by the native decoder after each picture and attached to the picture's
PictureData; reference pictures pass their fields back in.
"""
import ctypes as c
import os

import numpy as np

from .. import constants as k
from ..restrictions import ALL_FLAGS
from . import family_offsets
from ..cabac.contexts import FAMILIES, OFFSETS


class XvcnRefPic(c.Structure):
    _fields_ = [
        ("plane", c.c_int64 * 3),
        ("stride", c.c_int64 * 3),
        ("mvfield", c.c_int64),
        ("mf_stride", c.c_int32),
        ("poc", c.c_int32),
        ("pic_type", c.c_int32),
        ("width", c.c_int32),
        ("height", c.c_int32),
        ("pad_", c.c_int32),
        ("plane16", c.c_int64 * 3),
    ]


class XvcnPicParams(c.Structure):
    _fields_ = [
        ("bitstream", c.c_int64),
        ("bs_len", c.c_int64),
        ("bs_pos", c.c_int64),
        ("ctx_state", c.c_int64),
        ("fam41", c.c_int64),
        ("fam18", c.c_int64),
        ("restr", c.c_int64),
        ("tx_blob", c.c_int64),
        ("tx_offsets", c.c_int64),
        ("rec_plane", c.c_int64 * 3),
        ("rec_stride", c.c_int64 * 3),
        ("out_mvfield", c.c_int64),
        ("out_mf_stride", c.c_int32),
        ("width", c.c_int32),
        ("height", c.c_int32),
        ("bitdepth", c.c_int32),
        ("chroma_fmt", c.c_int32),
        ("pic_qp", c.c_int32),
        ("pred_type", c.c_int32),
        ("adaptive_qp", c.c_int32),
        ("lic_active", c.c_int32),
        ("tmvp_valid", c.c_int32),
        ("tmvp_ref_list", c.c_int32),
        ("tmvp_ref_idx", c.c_int32),
        ("force_l1_mvd_zero", c.c_int32),
        ("max_binary_split_depth", c.c_int32),
        ("chroma_qp_offset_table", c.c_int32),
        ("chroma_qp_offset_u", c.c_int32),
        ("chroma_qp_offset_v", c.c_int32),
        ("deblock", c.c_int32),
        ("beta_offset", c.c_int32),
        ("tc_offset", c.c_int32),
        ("poc", c.c_int32),
        ("num_ref", c.c_int32 * 2),
        ("pad_", c.c_int32),
        ("refs", (XvcnRefPic * 5) * 2),
        ("out_bs_pos", c.c_int64),
        ("parse_ns", c.c_int64),
        ("recon_ns", c.c_int64),
        ("deblock_ns", c.c_int64),
        ("mc_ns", c.c_int64),
        ("intra_ns", c.c_int64),
        ("itx_ns", c.c_int64),
        ("coeff_ns", c.c_int64),
        ("status", c.c_int32),
        ("profile", c.c_int32),
    ]


_TX_CACHE = None     # (blob, offsets) int32 arrays, kept alive
_FAM41 = None
_FAM18 = None


def _tx_tables():
    """Flatten the transform basis matrices into one blob + offset index.

    Index layout: [family][log2size] with families
    0=dct2 1=dct2lo 2=dct5 3=dct8 4=dst1 5=dst7 (see get_tx_matrix).
    """
    global _TX_CACHE
    if _TX_CACHE is not None:
        return _TX_CACHE
    from ..ops.transform import _TABLES
    fams = ["dct2", "dct2lo", "dct5", "dct8", "dst1", "dst7"]
    offsets = np.full(6 * 7, -1, dtype=np.int32)
    chunks = []
    pos = 0
    for fi, fam in enumerate(fams):
        for l2 in range(1, 7):
            size = 1 << l2
            key = f"{fam}_{size}"
            if key not in _TABLES:
                continue
            m = np.ascontiguousarray(_TABLES[key], dtype=np.int32)
            offsets[fi * 7 + l2] = pos
            chunks.append(m.reshape(-1))
            pos += m.size
    blob = np.ascontiguousarray(np.concatenate(chunks), dtype=np.int32)
    _TX_CACHE = (blob, offsets)
    return _TX_CACHE


def _restr_vec(restrictions):
    vec = getattr(restrictions, "_xvcn_vec", None)
    if vec is None:
        vec = np.array([1 if getattr(restrictions, name) else 0
                        for name in ALL_FLAGS], dtype=np.uint8)
        try:
            restrictions._xvcn_vec = vec
        except AttributeError:
            pass
    return vec


def _fam_arrays():
    global _FAM41, _FAM18
    if _FAM41 is None:
        _FAM41 = np.array([OFFSETS[name] for name, _ in FAMILIES],
                          dtype=np.int32)
        _FAM18 = family_offsets()
    return _FAM41, _FAM18


def available():
    from . import LIB
    return LIB is not None and hasattr(LIB, "xvcn_decode_picture")


class XvcnPostParams(c.Structure):
    _fields_ = [
        ("plane", c.c_int64 * 3),
        ("stride", c.c_int64 * 3),
        ("shadow", c.c_int64 * 3),
        ("out_bytes", c.c_int64),
        ("checksum_out", c.c_int64),
        ("width", c.c_int32 * 3),
        ("height", c.c_int32 * 3),
        ("disp_width", c.c_int32 * 3),
        ("disp_height", c.c_int32 * 3),
        ("pad_x", c.c_int32 * 3),
        ("pad_y", c.c_int32 * 3),
        ("num_comps", c.c_int32),
        ("bitdepth", c.c_int32),
        ("out_bitdepth", c.c_int32),
        ("do_pad", c.c_int32),
        ("checksum_method", c.c_int32),
        ("checksum_mode", c.c_int32),
        ("checksum_len", c.c_int32),
        ("profile", c.c_int32),
        ("pad_", c.c_int32),
        ("pad_ns", c.c_int64),
        ("shadow_ns", c.c_int64),
        ("checksum_ns", c.c_int64),
        ("out_ns", c.c_int64),
        ("stages", c.c_int32),
        ("elem16", c.c_int32),
        ("pad3_", c.c_int32),
    ]


def post_available():
    from . import LIB
    return LIB is not None and hasattr(LIB, "xvcn_postprocess")


_POST_EXECUTOR = None


def async_post_enabled():
    """Overlapped checksum/output only pays off with a second core to
    run it on; on a single-CPU host the extra thread just steals cycles
    from the decode (measured ~20% slower).  XVC_ASYNC_POST=0/1
    overrides the automatic choice."""
    v = os.environ.get("XVC_ASYNC_POST")
    if v is not None:
        return v != "0"
    return (os.cpu_count() or 1) > 1


def _post_executor():
    """Single worker thread for the read-only postprocess stages
    (checksum + output serialization).  The ctypes call releases the
    GIL, so the hash of picture N overlaps the native decode of N+1 —
    the role of the reference's decoded-picture output path running
    ahead of conformance checking."""
    global _POST_EXECUTOR
    if _POST_EXECUTOR is None:
        import concurrent.futures
        _POST_EXECUTOR = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="xvcn-post")
    return _POST_EXECUTOR


def postprocess(rec_pic, do_pad, want_shadow, checksum_method,
                checksum_mode, out_fmt, split_async=False):
    """One native pass: border pad, int16 shadow refresh, checksum and
    output serialization (the four host-side postprocess stages, fused;
    ref: src/xvc_dec_lib/picture_decoder.cc:102-151,
    src/xvc_common_lib/yuv_pic.cc:118-150, resample.cc:304-338).

    Returns (pic_hash_bytes_or_None, output_bytes_or_None); out_fmt may
    be None to skip serialization (caller falls back to convert_to for
    resize / ARGB / dither outputs).

    With split_async=True, the reference-critical stage (pad + shadow)
    runs synchronously and the read-only stage (checksum + output)
    is submitted to a worker thread; returns a join() callable that
    waits and returns the same (pic_hash, out_bytes) tuple.
    """
    from . import LIB
    p = XvcnPostParams()
    num_comps = 3 if rec_pic.chroma_format != 0 else 1
    import numpy as np
    keep = []
    native16 = getattr(rec_pic, "_native16", False)
    p.elem16 = 1 if native16 else 0
    for comp in range(min(num_comps, 3)):
        # native16: pad/checksum/output run straight off the int16
        # surface (no int32 materialization, no shadow refresh)
        buf = rec_pic.rec16(comp) if native16 else             rec_pic.padded_plane(comp)
        p.plane[comp] = buf.ctypes.data
        p.stride[comp] = buf.shape[1]
        p.width[comp] = rec_pic.width[comp]
        p.height[comp] = rec_pic.height[comp]
        p.disp_width[comp] = rec_pic.get_display_width(comp)
        p.disp_height[comp] = rec_pic.get_display_height(comp)
        p.pad_x[comp] = rec_pic.pad_x[comp]
        p.pad_y[comp] = rec_pic.pad_y[comp]
        keep.append(buf)
        if want_shadow and not native16:
            cache = rec_pic._s16_slots()
            if cache[comp] is None or cache[comp].shape != buf.shape:
                cache[comp] = np.empty(buf.shape, np.int16)
            p.shadow[comp] = cache[comp].ctypes.data
            keep.append(cache[comp])
    p.num_comps = num_comps
    p.bitdepth = rec_pic.bitdepth
    p.do_pad = 1 if do_pad else 0
    if checksum_method is not None:
        digest = np.zeros(48, np.uint8)
        p.checksum_out = digest.ctypes.data
        p.checksum_method = 1 if checksum_method == k.ChecksumMethod.MD5 \
            else 2
        p.checksum_mode = int(checksum_mode)
        keep.append(digest)
    out_buf = None
    if out_fmt is not None:
        out_bitdepth = out_fmt["bitdepth"]
        itemsize = 1 if out_bitdepth <= 8 else 2
        total = sum(rec_pic.get_display_width(comp) *
                    rec_pic.get_display_height(comp)
                    for comp in range(num_comps))
        out_buf = np.empty(total * itemsize, np.uint8)
        p.out_bytes = out_buf.ctypes.data
        p.out_bitdepth = out_bitdepth
        keep.append(out_buf)
    from ..profiling import enabled as _prof_enabled, add_span_time
    p.profile = 1 if _prof_enabled() else 0

    def _harvest():
        if p.profile:
            add_span_time("decode.native.post.pad", p.pad_ns / 1e9)
            add_span_time("decode.native.post.shadow", p.shadow_ns / 1e9)
            add_span_time("decode.native.post.checksum", p.checksum_ns / 1e9)
            add_span_time("decode.native.post.out", p.out_ns / 1e9)
        pic_hash = bytes(digest[:p.checksum_len]) \
            if checksum_method is not None else None
        out_bytes = out_buf.tobytes() if out_buf is not None else None
        return pic_hash, out_bytes

    if not split_async:
        p.stages = 3
        LIB.xvcn_postprocess(c.byref(p))
        return _harvest()

    p.stages = 1
    LIB.xvcn_postprocess(c.byref(p))

    def _stage2():
        p.stages = 2
        LIB.xvcn_postprocess(c.byref(p))
        return keep  # hold plane/digest/out buffers until joined

    fut = _post_executor().submit(_stage2)

    def join():
        fut.result()
        return _harvest()

    join.done = fut.done  # non-blocking readiness probe
    return join


def _surface_base(pic, comp):
    """Visible-origin pointer into the picture's int16 surface."""
    buf = pic.rec16(comp)
    off = (pic.pad_y[comp] * buf.shape[1] + pic.pad_x[comp]) * 2
    return buf.ctypes.data + off, buf.shape[1], buf


def mvfield_shape(width, height):
    num_cu_x = (width + k.MAX_BLOCK_SIZE - 1) // k.MIN_BLOCK_SIZE
    num_cu_y = (height + k.MAX_BLOCK_SIZE - 1) // k.MIN_BLOCK_SIZE
    return num_cu_y + 1, num_cu_x + 1


def decode_picture(pic_decoder, segment, bit_reader, qp):
    """Returns (success, finish_ok).  Raises ValueError on parse error
    (same contract as the Python CU path)."""
    pd = pic_decoder.pic_data
    rec = pic_decoder.rec_pic
    restr = segment.restrictions
    fam41, fam18 = _fam_arrays()
    tx_blob, tx_offsets = _tx_tables()
    restr_vec = _restr_vec(restr)

    from ..cabac.contexts import CabacContexts
    ctx = CabacContexts(restr)
    ctx.reset_states(qp.get_qp_raw(0), pd.get_prediction_type())

    p = XvcnPicParams()
    buf = bit_reader.buf
    buf_arr = np.frombuffer(buf, dtype=np.uint8)
    p.bitstream = buf_arr.ctypes.data
    p.bs_len = len(buf)
    p.bs_pos = bit_reader.pos
    p.ctx_state = ctx.state.ctypes.data
    p.fam41 = fam41.ctypes.data
    p.fam18 = fam18.ctypes.data
    p.restr = restr_vec.ctypes.data
    p.tx_blob = tx_blob.ctypes.data
    p.tx_offsets = tx_offsets.ctypes.data
    rec.begin_native16()  # int16 surface becomes authoritative
    for comp in range(3):
        base, stride, _buf = _surface_base(rec, comp)
        p.rec_plane[comp] = base
        p.rec_stride[comp] = stride
    rows, cols = mvfield_shape(pd.width, pd.height)
    # per-slot pooled motion-field buffer (the native decoder memsets
    # it before filling, xvcn_pic.inc, so no Python-side zeroing); each
    # LIVE picture needs its own field, and a decoder slot is only
    # reused once its picture left the reference window
    mvfield = getattr(pic_decoder, "_mvfield_buf", None)
    if mvfield is None or mvfield.size != rows * cols * 8:
        mvfield = np.empty(rows * cols * 8, dtype=np.int32)
        pic_decoder._mvfield_buf = mvfield
    p.out_mvfield = mvfield.ctypes.data
    p.out_mf_stride = cols
    p.width = pd.width
    p.height = pd.height
    p.bitdepth = pd.bitdepth
    p.chroma_fmt = int(pd.chroma_format)
    p.pic_qp = pic_decoder.pic_qp
    p.pred_type = int(pd.get_prediction_type())
    p.adaptive_qp = pd.adaptive_qp
    p.lic_active = 1 if pd.lic_active else 0
    p.tmvp_valid = 1 if pd.tmvp_valid else 0
    p.tmvp_ref_list = pd.tmvp_ref_list
    p.tmvp_ref_idx = pd.tmvp_ref_idx
    p.force_l1_mvd_zero = 1 if pd.force_bipred_l1_mvd_zero else 0
    p.max_binary_split_depth = segment.max_binary_split_depth
    p.chroma_qp_offset_table = segment.chroma_qp_offset_table
    p.chroma_qp_offset_u = segment.chroma_qp_offset_u
    p.chroma_qp_offset_v = segment.chroma_qp_offset_v
    p.deblock = 1 if pd.deblock else 0
    p.beta_offset = pd.beta_offset
    p.tc_offset = pd.tc_offset
    p.poc = pd.poc
    from ..profiling import enabled as _prof_enabled
    p.profile = 1 if _prof_enabled() else 0
    keep_alive = [buf_arr, mvfield, ctx.state, fam41, fam18, tx_blob,
                  tx_offsets, restr_vec]
    rpl = pd.ref_pic_lists
    for lst in range(2):
        n = min(rpl.get_num_ref_pics(lst), 5)
        p.num_ref[lst] = n
        for i in range(n):
            entry = rpl.entries[lst][i]
            rp = p.refs[lst][i]
            rp.poc = entry.poc
            rp.pic_type = int(entry.pic_data.get_prediction_type())
            rp.width = entry.rec_pic.width[0]
            rp.height = entry.rec_pic.height[0]
            for comp in range(3):
                # int16 reference surface: the rec16 surface of a
                # native-decoded picture, or the cached conversion of a
                # Python-path picture (shadow16 handles both)
                sh = entry.rec_pic.shadow16(comp)
                off16 = 2 * (entry.rec_pic.pad_y[comp] * sh.shape[1] +
                             entry.rec_pic.pad_x[comp])
                rp.plane16[comp] = sh.ctypes.data + off16
                rp.plane[comp] = rp.plane16[comp]  # presence flag only
                rp.stride[comp] = sh.shape[1]
                keep_alive.append(sh)
            mf = getattr(entry.pic_data, "_xvcn_mvfield", None)
            if mf is not None:
                rp.mvfield = mf.ctypes.data
                rp.mf_stride = getattr(entry.pic_data, "_xvcn_mf_stride", 0)
                keep_alive.append(mf)
            else:
                rp.mvfield = 0
                rp.mf_stride = 0

    from . import LIB
    status = LIB.xvcn_decode_picture(c.byref(p))
    del keep_alive
    from ..profiling import add_span_time
    add_span_time("decode.native.parse", p.parse_ns / 1e9)
    add_span_time("decode.native.parse.coeff", p.coeff_ns / 1e9)
    add_span_time("decode.native.recon", p.recon_ns / 1e9)
    add_span_time("decode.native.recon.mc", p.mc_ns / 1e9)
    add_span_time("decode.native.recon.intra", p.intra_ns / 1e9)
    add_span_time("decode.native.recon.itx", p.itx_ns / 1e9)
    add_span_time("decode.native.deblock", p.deblock_ns / 1e9)
    if status not in (0, 3):
        raise ValueError("corrupt bitstream (native decode status %d)"
                         % status)
    bit_reader.pos = p.out_bs_pos
    bit_reader.bit_mask = 0x80
    pd._xvcn_mvfield = mvfield
    pd._xvcn_mf_stride = cols
    return status == 0


# ---------------------------------------------------------------------------
# Parse-only native decode for the device reconstruction path
# (XVC_DSP=jax): CABAC parse + MV derivation run in C++
# (xvcn_parse_picture) and the Python CU tree is rebuilt from flat
# records — no entropy decoding or MV derivation in Python, the
# SURVEY §2.5 mapping (CABAC as the sequential host tail feeding the
# batched device stages; ref: src/xvc_dec_lib/cu_decoder.cc:60-100).
# ---------------------------------------------------------------------------

PARSE_REC_STRIDE = 72  # must match kNParseRecStride in xvcn_pic.inc


def parse_available():
    from . import LIB
    return LIB is not None and hasattr(LIB, "xvcn_parse_picture")


# Shared leaf defaults for the replay's fast CU factory.  The decode
# path never mutates these lists in place after parse (the Python
# syntax reader does, but it constructs its CUs through __init__ with
# fresh lists; replay CUs skip the reader entirely and calculate_mv is
# bypassed via pd.mv_resolved), so CUs that keep a default can share
# one object.  Fields the replay assigns per-item (coeff) stay fresh.
_MV0 = [[(0, 0)] * 4, [(0, 0)] * 4]
_MVD0 = [[(0, 0), (0, 0)], [(0, 0), (0, 0)]]
_IDX0 = [0, 0]
_F3 = [False, False, False]
_TT0 = [[0, 0], [0, 0]]
_EMPTY_SUBS = []


def _fast_cu(pic, tree, depth, x, y, w, h):
    """CodingUnit with reset_prediction_state-equivalent defaults but
    shared default containers (codec/cu.py __init__ is the hot cost of
    the tree replay: ~12 list allocations per CU)."""
    if x >= pic.width or y >= pic.height:
        return None
    from ..codec.cu import CodingUnit
    cu = object.__new__(CodingUnit)
    cu.pic = pic
    cu.cu_tree = tree
    cu.depth = depth
    cu.pos_x = x
    cu.pos_y = y
    cu.width = w
    cu.height = h
    cu.split = 0
    cu.sub_cus = _EMPTY_SUBS
    cu.pred_mode = 0
    cu.qp = None
    cu.intra_mode_luma = k.INTRA_MODE_INVALID
    cu.intra_mode_chroma = k.INTRA_MODE_INVALID
    cu.inter_dir = 0
    cu.skip_flag = False
    cu.merge_flag = False
    cu.merge_idx = -1
    cu.fullpel_mv = False
    cu.use_affine = False
    cu.use_lic = False
    cu.mv = _MV0
    cu.mvd = _MVD0
    cu.ref_idx = _IDX0
    cu.mvp_idx = _IDX0
    cu.root_cbf = False
    cu.cbf = _F3
    cu.transform_skip = _F3
    cu.dc_only = _F3
    cu.tx_type = _TT0
    cu.tx_select_idx = -1
    cu.coeff = [None, None, None]
    return cu


def _fast_split(cu, split):
    """do_split twin using the fast factory (same child geometry/order,
    ref: codec/cu.py CodingUnit.do_split)."""
    cu.split = split
    pic = cu.pic
    tree = cu.cu_tree
    sw, sh = cu.width >> 1, cu.height >> 1
    if split == 1:  # QUAD
        d = cu.depth + 1
        cu.sub_cus = [
            _fast_cu(pic, tree, d, cu.pos_x, cu.pos_y, sw, sh),
            _fast_cu(pic, tree, d, cu.pos_x + sw, cu.pos_y, sw, sh),
            _fast_cu(pic, tree, d, cu.pos_x, cu.pos_y + sh, sw, sh),
            _fast_cu(pic, tree, d, cu.pos_x + sw, cu.pos_y + sh, sw, sh),
        ]
    elif split == 2:  # HORIZONTAL
        cu.sub_cus = [
            _fast_cu(pic, tree, cu.depth, cu.pos_x, cu.pos_y,
                     cu.width, sh),
            _fast_cu(pic, tree, cu.depth, cu.pos_x, cu.pos_y + sh,
                     cu.width, sh),
        ]
    else:  # VERTICAL
        cu.sub_cus = [
            _fast_cu(pic, tree, cu.depth, cu.pos_x, cu.pos_y,
                     sw, cu.height),
            _fast_cu(pic, tree, cu.depth, cu.pos_x + sw, cu.pos_y,
                     sw, cu.height),
        ]


def _replay_tree(pd, rec, roots, coeff):
    """Rebuild the Python CU tree from exported parse records (record
    index == native pool slot; child indices are absolute)."""
    SplitType = k.SplitType
    _SPLIT_NONE = k.SplitType.NONE
    num_ctus = pd.get_number_of_ctus()
    stack = []
    for rsaddr in range(num_ctus):
        stack.append((pd.get_ctu(k.CuTree.PRIMARY, rsaddr),
                      int(roots[2 * rsaddr])))
        r1 = int(roots[2 * rsaddr + 1])
        if r1 >= 0:
            stack.append((pd.get_ctu(k.CuTree.SECONDARY, rsaddr), r1))
    # hot loop: raw python ints (IntEnum members compare equal to ints,
    # so consumers are unaffected); mvd is a pure encoder-side field and
    # is left at its default; availability marks are NOT set here -- the
    # reconstructor clears and re-marks in its own decode-order walk.
    rl = rec.tolist()
    get_qp = pd.get_qp_obj
    comps_of = pd.cu_tree_components
    while stack:
        cu, i = stack.pop()
        r = rl[i]
        cu.qp = get_qp(r[12])
        split = r[6]
        if split:
            _fast_split(cu, split)
            for j, sub in enumerate(cu.sub_cus):
                if sub is not None:
                    stack.append((sub, r[7 + j]))
            continue
        cu.split = 0
        # fresh CUs carry reset_prediction_state defaults; store only
        # the fields that differ (most flags are false on most leaves)
        if r[13]:
            cu.skip_flag = True
        if r[14]:
            cu.merge_flag = True
            cu.merge_idx = r[15]
        if r[20]:
            cu.root_cbf = True
        if r[21] or r[22] or r[23]:
            cu.cbf = [r[21] != 0, r[22] != 0, r[23] != 0]
        if r[24] or r[25] or r[26]:
            cu.transform_skip = [r[24] != 0, r[25] != 0, r[26] != 0]
        if r[27] or r[28] or r[29]:
            cu.dc_only = [r[27] != 0, r[28] != 0, r[29] != 0]
        if r[30] or r[31] or r[32] or r[33]:
            cu.tx_type = [[r[30], r[31]], [r[32], r[33]]]
        if r[34] != -1:
            cu.tx_select_idx = r[34]
        if r[11]:  # inter: final (derived) MVs
            cu.pred_mode = 1
            if r[16]:
                cu.inter_dir = r[16]
            if r[17]:
                cu.fullpel_mv = True
            if r[18]:
                cu.use_affine = True
            if r[19]:
                cu.use_lic = True
            if r[35] or r[36]:
                cu.ref_idx = [r[35], r[36]]
            if r[37] or r[38]:
                cu.mvp_idx = [r[37], r[38]]
            cu.mv = [[(r[41], r[42]), (r[43], r[44]),
                      (r[45], r[46]), (r[47], r[48])],
                     [(r[49], r[50]), (r[51], r[52]),
                      (r[53], r[54]), (r[55], r[56])]]
        else:
            cu.intra_mode_luma = r[39]
            cu.intra_mode_chroma = r[40]
        for comp in comps_of[r[0]]:
            off = r[65 + comp]
            if off >= 0:
                w, h = cu.size(comp)
                cu.coeff[comp] = coeff[off:off + w * h].reshape(h, w)
            else:
                cu.coeff[comp] = None


def parse_picture(pic_decoder, segment, bit_reader, qp, replay=True):
    """Native parse + MV derivation (+ Python tree replay).

    With replay=False only the flat record table / coefficient arena /
    motion field are produced (the record-driven device path,
    tpu/flat_recon.py, never touches Python CU objects).

    Same contract as decode_picture: returns conformance success,
    raises ValueError on parse errors."""
    pd = pic_decoder.pic_data
    restr = segment.restrictions
    fam41, fam18 = _fam_arrays()
    tx_blob, tx_offsets = _tx_tables()
    restr_vec = _restr_vec(restr)

    from ..cabac.contexts import CabacContexts
    ctx = CabacContexts(restr)
    ctx.reset_states(qp.get_qp_raw(0), pd.get_prediction_type())

    p = XvcnPicParams()
    buf = bit_reader.buf
    buf_arr = np.frombuffer(buf, dtype=np.uint8)
    p.bitstream = buf_arr.ctypes.data
    p.bs_len = len(buf)
    p.bs_pos = bit_reader.pos
    p.ctx_state = ctx.state.ctypes.data
    p.fam41 = fam41.ctypes.data
    p.fam18 = fam18.ctypes.data
    p.restr = restr_vec.ctypes.data
    p.tx_blob = tx_blob.ctypes.data
    p.tx_offsets = tx_offsets.ctypes.data
    for comp in range(3):
        p.rec_plane[comp] = 0   # parse touches no pixels
        p.rec_stride[comp] = 0
    rows, cols = mvfield_shape(pd.width, pd.height)
    mvfield = getattr(pic_decoder, "_mvfield_buf", None)
    if mvfield is None or mvfield.size != rows * cols * 8:
        mvfield = np.empty(rows * cols * 8, dtype=np.int32)
        pic_decoder._mvfield_buf = mvfield
    p.out_mvfield = mvfield.ctypes.data
    p.out_mf_stride = cols
    p.width = pd.width
    p.height = pd.height
    p.bitdepth = pd.bitdepth
    p.chroma_fmt = int(pd.chroma_format)
    p.pic_qp = pic_decoder.pic_qp
    p.pred_type = int(pd.get_prediction_type())
    p.adaptive_qp = pd.adaptive_qp
    p.lic_active = 1 if pd.lic_active else 0
    p.tmvp_valid = 1 if pd.tmvp_valid else 0
    p.tmvp_ref_list = pd.tmvp_ref_list
    p.tmvp_ref_idx = pd.tmvp_ref_idx
    p.force_l1_mvd_zero = 1 if pd.force_bipred_l1_mvd_zero else 0
    p.max_binary_split_depth = segment.max_binary_split_depth
    p.chroma_qp_offset_table = segment.chroma_qp_offset_table
    p.chroma_qp_offset_u = segment.chroma_qp_offset_u
    p.chroma_qp_offset_v = segment.chroma_qp_offset_v
    p.deblock = 0  # parse only; the device path deblocks
    p.beta_offset = pd.beta_offset
    p.tc_offset = pd.tc_offset
    p.poc = pd.poc
    from ..profiling import enabled as _prof_enabled
    p.profile = 1 if _prof_enabled() else 0
    keep_alive = [buf_arr, mvfield, ctx.state, fam41, fam18, tx_blob,
                  tx_offsets, restr_vec]
    rpl = pd.ref_pic_lists
    for lst in range(2):
        n = min(rpl.get_num_ref_pics(lst), 5)
        p.num_ref[lst] = n
        for i in range(n):
            entry = rpl.entries[lst][i]
            rp = p.refs[lst][i]
            rp.poc = entry.poc
            rp.pic_type = int(entry.pic_data.get_prediction_type())
            rp.width = entry.rec_pic.width[0]
            rp.height = entry.rec_pic.height[0]
            for comp in range(3):
                rp.plane16[comp] = 0  # MV derivation reads no samples
                rp.plane[comp] = 0
                rp.stride[comp] = 0
            mf = getattr(entry.pic_data, "_xvcn_mvfield", None)
            if mf is not None:
                rp.mvfield = mf.ctypes.data
                rp.mf_stride = getattr(entry.pic_data, "_xvcn_mf_stride", 0)
                keep_alive.append(mf)
            else:
                rp.mvfield = 0
                rp.mf_stride = 0

    from . import LIB
    if LIB.xvcn_parse_picture.argtypes is None:
        LIB.xvcn_parse_picture.restype = c.c_int
        LIB.xvcn_parse_picture.argtypes = [
            c.c_void_p, c.c_void_p, c.c_int64,
            c.POINTER(c.c_int64), c.POINTER(c.c_int32)]
        LIB.xvcn_export_parse.restype = None
        LIB.xvcn_export_parse.argtypes = [c.c_void_p, c.c_int32,
                                          c.c_void_p]
    coeff = np.empty(3 * pd.width * pd.height, dtype=np.int32)
    ncoeff = c.c_int64(0)
    nrec = c.c_int32(0)
    status = LIB.xvcn_parse_picture(c.byref(p), coeff.ctypes.data,
                                    coeff.size, c.byref(ncoeff),
                                    c.byref(nrec))
    del keep_alive
    from ..profiling import add_span_time
    add_span_time("decode.parse.native", p.parse_ns / 1e9)
    if status not in (0, 3):
        raise ValueError("corrupt bitstream (native parse status %d)"
                         % status)
    rec = np.empty((int(nrec.value), PARSE_REC_STRIDE), dtype=np.int32)
    # sized from geometry, NOT get_number_of_ctus(): the flat path
    # (light pd.init) never allocates the Python CTU lists
    roots = np.empty(2 * pd.ctu_num_x * pd.ctu_num_y, dtype=np.int32)
    LIB.xvcn_export_parse(rec.ctypes.data, PARSE_REC_STRIDE,
                          roots.ctypes.data)
    if replay:
        from ..profiling import span
        with span("decode.parse.replay"):
            _replay_tree(pd, rec, roots, coeff)
    bit_reader.pos = p.out_bs_pos
    bit_reader.bit_mask = 0x80
    pd._xvcn_mvfield = mvfield
    pd._xvcn_mf_stride = cols
    pd.mv_resolved = True
    # the flat record table also feeds the vectorized deblock cu-map
    # builder (ops/deblock.py _build_cu_maps_from_records) and the
    # record-driven device reconstruction (tpu/flat_recon.py)
    pd._parse_records = rec
    pd._parse_coeff = coeff[:int(ncoeff.value)]
    pd._parse_status = status
    return status == 0
