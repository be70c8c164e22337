"""Batched device reconstruction of one decoded picture.

Replaces the reference's per-CU interleaved reconstruct loop
(ref: src/xvc_dec_lib/cu_decoder.cc:86-138) with a TPU-shaped two-phase
schedule: the host CABAC parse runs first for the whole picture, then

  stage A (host, cheap)   walk leaves in decode order replaying the CU
                          availability marks, derive MVs, and emit
                          per-block job tensors;
  stage B (device)        fused dequant + inverse transform of every
                          coded block, batched by shape/kind;
  stage C (device)        sub-pel MC of every non-LIC inter block,
                          batched by shape, reading stacked ref planes;
  stage D (host, sparse)  sequential z-order pass over intra and LIC
                          blocks only (their prediction reads
                          reconstructed neighbours, the codec's
                          inherently sequential tail).

The mark replay in stages A/D reproduces the reference's neighbour
availability exactly (ClearMarkCuInPic/MarkUsedInPic protocol,
ref: cu_decoder.cc:47-100), so output is bit-identical to the host
path; tests pin this on every golden stream.
"""
import numpy as np

from .. import constants as k

# number of blocks the sequential host tail processed for the last
# device-reconstructed picture (test/bench observability)
LAST_TAIL_BLOCKS = -1
from ..codec import inter_mc
from ..codec import inter_mv as mv_mod
from . import dsp


class JaxReconstructor:
    def __init__(self, cu_decoder):
        self.dec = cu_decoder
        self.pic = cu_decoder.pic
        self.rec = cu_decoder.rec
        self.restr = cu_decoder.restr
        self.bitdepth = self.rec.bitdepth
        self.hp_tx = not self.restr.disable_ext2_transform_high_precision
        self.hp_mv = not self.restr.disable_ext2_inter_high_precision_mv
        self._itx_groups = {}   # key -> [(coeff, scale, comp, cx, cy)]
        self._mc_groups = {}    # key -> [(plane_ref, y0, x0, fx, fy,
                                #           dest_plane, dy, dx)]
        self._inter_recs = []   # (cu, comp, kind)
        # per-(list-slot, comp) int16 prediction planes: MC gathers land
        # directly in picture coordinates (no per-CU buffers), and the
        # bi average / residual add / clip run as whole-plane ops
        self._pred_planes = {}
        self._planes = {}       # (id(pic), comp) -> (shape, index)
        self._stacks = {}       # shape -> [np padded planes]

    # ------------------------------------------------------------------
    def reconstruct_picture(self):
        from ..profiling import span
        with span("recon.collect"):
            self._clear_all_marks()
            self._for_each_leaf(self._collect_leaf)
        from ..engine import get_mesh, get_pin_device
        # a per-picture device pin (GOP-across-devices decode pipeline)
        # overrides block-level mesh sharding: the picture IS the shard
        mesh = get_mesh() if get_pin_device() is None else None
        if mesh is not None:
            with span("recon.dispatch"):
                itx_launched = self._launch_itx_sharded(mesh)
                mc_launched = self._launch_mc_sharded(mesh)
        else:
            # One flat upload carries every group's inputs (the TPU
            # tunnel costs ~100ms per transfer), groups slice it
            # on-device, and all outputs come back in one device-side
            # concat per stage.
            with span("recon.prep"):
                batch = dsp.DevBatch()
                itx_prep = self._prep_itx(batch)
                mc_prep = self._prep_mc(batch)
            with span("recon.upload"):
                batch.upload()
            with span("recon.dispatch"):
                itx_launched = self._launch_itx(batch, itx_prep)
                mc_launched = self._launch_mc(batch, mc_prep)
        with span("recon.itx"):
            resi = self._gather_itx(itx_launched)
        with span("recon.mc"):
            self._gather_mc(mc_launched)
        with span("recon.write_inter"):
            self._write_inter(resi)
        scanned = False
        if self._can_scan_intra():
            with span("recon.intra_scan"):
                scanned = self._device_intra_luma(resi)
        scanned_chroma = False
        if scanned and self._can_scan_chroma():
            with span("recon.chroma_scan"):
                scanned_chroma = self._device_intra_chroma(resi)
        global LAST_TAIL_BLOCKS
        LAST_TAIL_BLOCKS = 0
        with span("recon.sequential"):
            self._clear_all_marks()
            self._for_each_leaf(
                lambda cu: self._sequential_leaf(
                    cu, resi, skip_luma=scanned,
                    skip_chroma=scanned_chroma))

    # ------------------------------------------------------------------
    def _trees(self):
        trees = [k.CuTree.PRIMARY]
        if self.pic.has_secondary_cu_tree():
            trees.append(k.CuTree.SECONDARY)
        return trees

    def _clear_all_marks(self):
        for tree in self._trees():
            for ctu in self.pic.ctus[int(tree)]:
                self.pic.clear_mark_cu_in_pic(ctu)

    def _for_each_leaf(self, visitor):
        """Decode-order leaf walk with incremental availability marking
        (the decompress-order replay; ref: cu_decoder.cc:86-100).  For
        tile pictures the availability mask follows the CTU's tile, so
        every collected meta row (MVs, intra availability) reproduces
        the per-tile prediction cut while the device dispatch itself
        stays one whole-picture batch sharded over the mesh."""
        pic = self.pic
        tiled = pic.tile_rows > 1
        for rsaddr in range(pic.get_number_of_ctus()):
            if tiled:
                pic.tile_ctx_top_y = pic.tile_top_y_of_row(
                    rsaddr // pic.ctu_num_x)
            for tree in self._trees():
                self._visit(pic.get_ctu(tree, rsaddr), visitor)
        if tiled:
            pic.tile_ctx_top_y = 0

    def _visit(self, cu, visitor):
        if cu.split != k.SplitType.NONE:
            for sub in cu.sub_cus:
                if sub is not None:
                    self._visit(sub, visitor)
        else:
            self.pic.mark_used_in_pic(cu)
            visitor(cu)

    # ------------------------------------------------------------------
    # stage A: job collection
    # ------------------------------------------------------------------
    def _collect_leaf(self, cu):
        comps = self.pic.get_components(cu.cu_tree)
        for comp in comps:
            if cu.cbf[comp]:
                self._add_itx_job(cu, comp)
        if cu.is_inter():
            if not getattr(self.pic, "mv_resolved", False):
                self.dec.inter.calculate_mv(cu)
            if cu.use_lic:
                return  # sequential tail (template-based prediction)
            for comp in comps:
                self._add_mc_jobs(cu, comp)

    def _add_itx_job(self, cu, comp):
        cx, cy = cu.pos(comp)
        w, h = cu.size(comp)
        bias = ((w.bit_length() + h.bit_length()) % 2) != 0
        scale = cu.qp.get_inv_scale(comp) * (181 if bias else 1)
        if cu.transform_skip[comp]:
            key = (w, h, 0, 0, "skip")
        else:
            t0 = cu.get_transform_type(comp, 0)
            t1 = cu.get_transform_type(comp, 1)
            dflt = (k.TransformType.DEFAULT, k.TransformType.DCT2)
            can_dst4 = (comp == 0 and cu.is_intra() and
                        t0 == k.TransformType.DEFAULT and
                        t1 == k.TransformType.DEFAULT and
                        w == 4 and h == 4 and
                        not self.restr.disable_ext2_transform_dst)
            if can_dst4:
                key = (w, h, 0, 0, "dst4")
            elif cu.dc_only[comp] and t0 in dflt and t1 in dflt:
                key = (w, h, 0, 0, "dc")
            else:
                key = (w, h, int(t0), int(t1), "gen")
        self._itx_groups.setdefault(key, []).append(
            (cu.get_coeff(comp), scale, comp, cx, cy))

    def _plane_index(self, ref_pic, comp):
        """Reference planes stay resident on the device across pictures:
        the deblock stage writes its padded output into the frame-store
        superstack (tpu/flat_recon.py _dev_slot) or, under a mesh,
        attaches it to the picture (_dev_planes); only planes never
        produced on device (e.g. rescaled alt-rec pics, deblock-off
        streams) are uploaded.  Every entry is padded 64 right/bottom so
        bucketed MC windows never clamp."""
        pkey = (id(ref_pic), comp)
        if pkey not in self._planes:
            from ..engine import get_pin_device
            entry = None
            slots = getattr(ref_pic, "_dev_slots", None)
            slot_ent = slots.get(get_pin_device()) if slots else None
            if slot_ent is not None:
                store, slot, _ = slot_ent
                entry = store.plane(slot, comp)
            if entry is None and get_pin_device() is None:
                dev = getattr(ref_pic, "_dev_planes", None)
                entry = dev.get(comp) if dev else None
            if entry is None:
                entry = np.pad(
                    ref_pic.padded_plane(comp).astype(np.int16),
                    ((0, 64), (0, 64)))
            shape = entry.shape
            lst = self._stacks.setdefault(shape, [])
            self._planes[pkey] = (shape, len(lst))
            lst.append(entry)
        return self._planes[pkey]

    def _pred_plane(self, slot, comp):
        key = (slot, comp)
        pl = self._pred_planes.get(key)
        if pl is None:
            pl = np.empty((self.rec.height[comp], self.rec.width[comp]),
                          np.int16)
            self._pred_planes[key] = pl
        return pl

    def _add_mc_jobs(self, cu, comp):
        if cu.inter_dir != k.InterDir.BI:
            lists = [(0 if cu.inter_dir == k.InterDir.L0 else 1, False)]
        else:
            lists = [(0, True), (1, True)]
        cx, cy = cu.pos(comp)
        w, h = cu.size(comp)
        for slot, (ref_list, short) in enumerate(lists):
            dest = self._pred_plane(slot, comp)
            ref_pic = self.pic.ref_pic_lists.get_ref_pic(
                ref_list, cu.ref_idx[ref_list])
            if cu.use_affine:
                ctx = inter_mc.McContext(ref_pic, comp, cx, cy, w, h,
                                         self.bitdepth, self.restr)
                plan = inter_mc.affine_subblock_jobs(
                    cu, ctx, [cu.mv[ref_list][i] for i in range(3)])
                if plan[0] == "subblocks":
                    _, sw, sh, jobs = plan
                    for (x0, y0, fx, fy, dx, dy) in jobs:
                        self._emit_mc(ref_pic, comp, sw, sh, short,
                                      x0, y0, fx, fy, dest,
                                      cy + dy, cx + dx)
                    continue
                mv = plan[1]
            else:
                mv = mv_mod.clip_mv(cu, ref_pic, cu.mv[ref_list][0])
            pel_x, pel_y, fx, fy = inter_mc.get_fullpel_ref(
                cu, comp, ref_pic, mv[0], mv[1], self.restr)
            self._emit_mc(ref_pic, comp, w, h, short,
                          cx + pel_x, cy + pel_y, fx, fy, dest, cy, cx)
        self._inter_recs.append((cu, comp,
                                 "bi" if len(lists) == 2 else "uni"))

    @staticmethod
    def _bucket(n):
        """Round a block dimension up to {8,16,32,64} so MC batches
        collapse into a few shapes (device compute for the padding is
        discarded; dispatch latency dominates on the TPU tunnel)."""
        b = 8
        while b < n:
            b <<= 1
        return b

    def _emit_mc(self, ref_pic, comp, w, h, short, x0, y0, fx, fy,
                 buf, dy, dx):
        """Queue one sub-pel MC block; coords become padded-plane window
        origins (block origin minus (taps/2 - 1))."""
        luma = comp == 0
        taps = inter_mc.NUM_TAPS_LUMA if luma else inter_mc.NUM_TAPS_CHROMA
        half = taps // 2 - 1
        shape, ridx = self._plane_index(ref_pic, comp)
        ypad = ref_pic.pad_y[comp] + y0 - half
        xpad = ref_pic.pad_x[comp] + x0 - half
        key = (self._bucket(w), self._bucket(h), luma, short, shape)
        self._mc_groups.setdefault(key, []).append(
            (ridx, ypad, xpad, fx, fy, w, h, buf, dy, dx))

    # ------------------------------------------------------------------
    # stage B: dequant + inverse transform on device
    # ------------------------------------------------------------------
    def _prep_itx(self, batch):
        prep = []
        for (w, h, txv, txh, variant), jobs in self._itx_groups.items():
            b = len(jobs)
            bp = dsp.pad_pow2(b)
            coeffs = np.zeros((bp, h, w), dtype=np.int16)
            scales = np.zeros((bp,), dtype=np.int32)
            for i, (coeff, scale, _, _, _) in enumerate(jobs):
                coeffs[i] = coeff
                scales[i] = scale
            prep.append(((w, h, txv, txh, variant), jobs,
                         batch.add(coeffs), batch.add(scales)))
        return prep

    def _launch_itx(self, batch, prep):
        outs16, jobs16, outs32, jobs32 = [], [], [], []
        for (w, h, txv, txh, variant), jobs, hc, hs in prep:
            fn = dsp.make_dequant_itx(w, h, self.bitdepth, txv, txh,
                                      variant, self.hp_tx,
                                      dsp.pad_pow2(len(jobs)))
            f16, c_off = batch.flat(hc)
            f32, s_off = batch.flat(hs)
            dev = fn(f16, c_off, f32, s_off)
            if variant == "skip":
                outs32.append(dev)
                jobs32.append(((w, h), jobs))
            else:
                outs16.append(dev)
                jobs16.append(((w, h), jobs))
        return (dsp.gather_flat(outs16), jobs16,
                dsp.gather_flat(outs32), jobs32)

    def _gather_itx(self, launched):
        resi = [None, None, None]
        for c in range(self.pic.max_num_components):
            resi[c] = np.zeros((self.rec.height[c], self.rec.width[c]),
                               dtype=np.int32)
        (flat16, offs16), jobs16, (flat32, offs32), jobs32 = launched
        for flat, offs, groups in ((flat16, offs16, jobs16),
                                   (flat32, offs32, jobs32)):
            for (off, shape), ((w, h), jobs) in zip(offs, groups):
                out = flat[off:off + int(np.prod(shape))].reshape(shape)
                for i, (_, _, comp, cx, cy) in enumerate(jobs):
                    resi[comp][cy:cy + h, cx:cx + w] = out[i]
        return resi

    # ------------------------------------------------------------------
    # stage C: motion compensation on device
    # ------------------------------------------------------------------
    def _prep_mc(self, batch):
        prep = []
        for key, jobs in self._mc_groups.items():
            b = len(jobs)
            bp = dsp.pad_pow2(b)
            arr = np.zeros((5, bp), dtype=np.int32)
            for i, (ridx, ypad, xpad, fx, fy, _, _, _, _, _) in \
                    enumerate(jobs):
                arr[:, i] = (ridx, ypad, xpad, fx, fy)
            prep.append((key, jobs, batch.add(arr)))
        return prep

    def _launch_mc(self, batch, prep):
        if not prep:
            return (np.zeros(0, np.int16), []), []
        import jax.numpy as jnp
        dev_stacks = {shape: jnp.stack([jnp.asarray(p) for p in planes])
                      for shape, planes in self._stacks.items()}
        outs, metas = [], []
        for (wb, hb, luma, short, shape), jobs, hp in prep:
            fn = dsp.make_mc_kernel(wb, hb, luma, self.bitdepth,
                                    self.hp_mv, short,
                                    dsp.pad_pow2(len(jobs)))
            f32, p_off = batch.flat(hp)
            outs.append(fn(dev_stacks[shape], f32, p_off))
            metas.append(jobs)
        return dsp.gather_flat(outs), metas

    def _gather_mc(self, launched):
        (flat, offs), metas = launched
        for (off, shape), jobs in zip(offs, metas):
            out = flat[off:off + int(np.prod(shape))].reshape(shape)
            for i, (_, _, _, _, _, w, h, buf, dy, dx) in enumerate(jobs):
                buf[dy:dy + h, dx:dx + w] = out[i, :h, :w]

    # ------------------------------------------------------------------
    # sharded variants: block batches carry a NamedSharding over the
    # mesh 'blk' axis (dp over CU blocks), reference planes replicated
    # ------------------------------------------------------------------
    def _launch_itx_sharded(self, mesh):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dev = int(mesh.devices.size)
        s3 = NamedSharding(mesh, P("blk", None, None))
        s1 = NamedSharding(mesh, P("blk"))
        outs16, jobs16, outs32, jobs32 = [], [], [], []
        for (w, h, txv, txh, variant), jobs in self._itx_groups.items():
            bp = max(dsp.pad_pow2(len(jobs)), n_dev)
            coeffs = np.zeros((bp, h, w), dtype=np.int16)
            scales = np.zeros((bp,), dtype=np.int32)
            for i, (coeff, scale, _, _, _) in enumerate(jobs):
                coeffs[i] = coeff
                scales[i] = scale
            fn = dsp.make_dequant_itx_direct(w, h, self.bitdepth, txv,
                                             txh, variant, self.hp_tx)
            dev = fn(jax.device_put(coeffs, s3),
                     jax.device_put(scales, s1))
            if variant == "skip":
                outs32.append(dev)
                jobs32.append(((w, h), jobs))
            else:
                outs16.append(dev)
                jobs16.append(((w, h), jobs))
        return (dsp.gather_flat(outs16), jobs16,
                dsp.gather_flat(outs32), jobs32)

    def _launch_mc_sharded(self, mesh):
        if not self._mc_groups:
            return (np.zeros(0, np.int16), []), []
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dev = int(mesh.devices.size)
        repl = NamedSharding(mesh, P(None, None, None))
        sp = NamedSharding(mesh, P(None, "blk"))
        dev_stacks = {
            shape: jax.device_put(
                jnp.stack([jnp.asarray(p) for p in planes]), repl)
            for shape, planes in self._stacks.items()}
        outs, metas = [], []
        for (wb, hb, luma, short, shape), jobs in self._mc_groups.items():
            bp = max(dsp.pad_pow2(len(jobs)), n_dev)
            arr = np.zeros((5, bp), dtype=np.int32)
            for i, (ridx, ypad, xpad, fx, fy, _, _, _, _, _) in \
                    enumerate(jobs):
                arr[:, i] = (ridx, ypad, xpad, fx, fy)
            fn = dsp.make_mc_kernel_direct(wb, hb, luma, self.bitdepth,
                                           self.hp_mv, short)
            outs.append(fn(dev_stacks[shape], jax.device_put(arr, sp)))
            metas.append(jobs)
        return dsp.gather_flat(outs), metas

    def _write_inter(self, resi):
        if not self._inter_recs:
            return
        max_pel = (1 << self.bitdepth) - 1
        # whole-plane math (uni pixels read slot-0, bi pixels the exact
        # add_avg of both slots; untouched pixels are never stored), then
        # one rectangle copy per (CU, comp)
        uni_reco, bi_reco = {}, {}
        kinds = {(comp, kind) for _, comp, kind in self._inter_recs}
        for comp, kind in kinds:
            p0 = self._pred_planes[(0, comp)]
            if kind == "bi":
                pred = inter_mc.add_avg_bi(p0, self._pred_planes[(1, comp)],
                                           self.bitdepth)
                bi_reco[comp] = np.clip(pred + resi[comp], 0, max_pel)
            else:
                uni_reco[comp] = np.clip(p0.astype(np.int32) + resi[comp],
                                         0, max_pel)
        for cu, comp, kind in self._inter_recs:
            cx, cy = cu.pos(comp)
            w, h = cu.size(comp)
            src = bi_reco[comp] if kind == "bi" else uni_reco[comp]
            self.rec.plane_view(comp)[cy:cy + h, cx:cx + w] = \
                src[cy:cy + h, cx:cx + w]

    # ------------------------------------------------------------------
    # stage D: sequential intra / LIC tail
    # ------------------------------------------------------------------
    def _can_scan_intra(self):
        """The device intra scan covers the default (unrestricted)
        67-mode luma toolset; LIC pictures fall back (LIC blocks
        interleave with intra in decode order on the host)."""
        if self.pic.lic_active:
            return False
        r = self.restr
        if r.disable_ext2_intra_67_modes:
            return False
        from ..codec.intra_search import _intra_restrictions_default
        return _intra_restrictions_default(r)

    def _can_scan_chroma(self):
        """The device chroma scan covers the 4:2:0 default toolset
        (planar/DC/angular/DM/LM); other chroma formats keep the host
        tail (their LM downsample filters differ)."""
        return (self.pic.chroma_format == k.ChromaFormat.YUV420 and
                not self.restr.disable_intra_chroma_predictor and
                not self.restr.disable_ext2_intra_chroma_from_luma)

    def _device_intra_chroma(self, resi):
        """Reconstruct every intra chroma block (u and v) in one device
        scan, LM prediction included; the final luma plane is already
        device-resident from the luma scan."""
        from . import intra_scan
        meta_rows = []

        def collect(cu):
            if not cu.is_intra():
                return
            comps = self.pic.get_components(cu.cu_tree)
            for comp in comps:
                if comp == 0:
                    continue
                cx, cy = cu.pos(comp)
                w, h = cu.size(comp)
                has_l = cx > 0
                shift = self.pic.chroma_shift_y if comp else 0
                has_a = cy > (self.pic.tile_ctx_top_y >> shift)
                sbl = cu.get_cu_size_below_left(comp) if has_l else 0
                sar = cu.get_cu_size_above_right(comp) if has_a else 0
                mode = cu.get_intra_mode(comp)
                is_lm = 1 if mode == k.INTRA_MODE_LM_CHROMA else 0
                meta_rows.append((comp - 1, cx, cy, w, h, max(mode, 0),
                                  is_lm, int(has_l), int(has_a),
                                  int(has_l and has_a), sbl, sar, 1))

        self._clear_all_marks()
        self._for_each_leaf(collect)
        if not meta_rows:
            return True
        import jax.numpy as jnp
        n = len(meta_rows)
        np2 = dsp.pad_pow2(n)
        meta = np.zeros((np2, intra_scan.CMETA_COLS), np.int32)
        meta[:n] = meta_rows
        u = intra_scan.plane_pad(self.rec.plane_view(1))
        v = intra_scan.plane_pad(self.rec.plane_view(2))
        planes = np.stack([u, v])
        ru = intra_scan.plane_pad(resi[1], dtype=np.int32)
        rv = intra_scan.plane_pad(resi[2], dtype=np.int32)
        rst = np.stack([ru, rv])
        # the luma scan left the padded final luma on device
        luma_dev = getattr(self, "_luma_scan_out", None)
        if luma_dev is None:
            luma_dev = jnp.asarray(
                intra_scan.plane_pad(self.rec.plane_view(0)))
        fn = intra_scan.make_intra_chroma_scan(
            planes.shape[1], planes.shape[2],
            int(luma_dev.shape[0]), int(luma_dev.shape[1]), self.bitdepth)
        out_dev = fn(jnp.asarray(planes), jnp.asarray(rst), luma_dev,
                     jnp.asarray(meta))
        pt = intra_scan.PAD_TL
        out = np.asarray(out_dev)
        for comp in (1, 2):
            vis = self.rec.plane_view(comp)
            vis[:] = out[comp - 1, pt:pt + vis.shape[0],
                         pt:pt + vis.shape[1]]
        return True

    def _device_intra_luma(self, resi):
        """Reconstruct every intra luma block of the picture in ONE
        device dispatch (lax.scan over leaves in decode order); see
        xvc_tpu/tpu/intra_scan.py."""
        from . import intra_scan
        meta_rows = []

        def collect(cu):
            if not cu.is_intra() or cu.cu_tree != k.CuTree.PRIMARY:
                return
            cx, cy = cu.pos(0)
            w, h = cu.size(0)
            has_l = cx > 0
            has_a = cy > self.pic.tile_ctx_top_y  # tile top = virtual top
            sbl = cu.get_cu_size_below_left(0) if has_l else 0
            sar = cu.get_cu_size_above_right(0) if has_a else 0
            meta_rows.append((cx, cy, w, h, cu.get_intra_mode(0),
                              int(has_l), int(has_a),
                              int(has_l and has_a), sbl, sar, 1))

        self._clear_all_marks()
        self._for_each_leaf(collect)
        if not meta_rows:
            return True  # no intra luma at all; nothing to skip
        # the scan pays a fixed plane upload/download per picture: only
        # worth it when intra covers a meaningful share (inter pictures
        # with a few intra blocks stay on the host tail)
        intra_area = sum(r[2] * r[3] for r in meta_rows)
        if intra_area * 4 < self.pic.width * self.pic.height:
            return False
        import jax.numpy as jnp
        n = len(meta_rows)
        np2 = dsp.pad_pow2(n)
        meta = np.zeros((np2, intra_scan.META_COLS), np.int32)
        meta[:n] = meta_rows
        plane = intra_scan.plane_pad(self.rec.plane_view(0))
        rpad = intra_scan.plane_pad(resi[0], dtype=np.int32)
        fn = intra_scan.make_intra_scan(plane.shape[0], plane.shape[1],
                                        self.bitdepth)
        out_dev = fn(jnp.asarray(plane), jnp.asarray(rpad),
                     jnp.asarray(meta))
        pt = intra_scan.PAD_TL
        vis = self.rec.plane_view(0)
        vis_dev = out_dev[pt:pt + vis.shape[0], pt:pt + vis.shape[1]]
        vis[:] = np.asarray(vis_dev)
        # the final pre-deblock luma is already on device: let the
        # deblock stage consume it instead of re-uploading; the chroma
        # scan reads the padded version for LM
        self.rec._dev_pre_deblock = vis_dev
        self._luma_scan_out = out_dev
        return True

    def _sequential_leaf(self, cu, resi, skip_luma=False,
                         skip_chroma=False):
        if not (cu.is_intra() or (cu.is_inter() and cu.use_lic)):
            return
        dec = self.dec
        dec.intra.invalidate_lm_cache()
        max_pel = (1 << self.bitdepth) - 1
        for comp in self.pic.get_components(cu.cu_tree):
            if skip_luma and comp == 0:
                continue  # luma handled by the device intra scan
            if skip_chroma and comp != 0 and cu.is_intra():
                continue  # chroma handled by the device chroma scan
            global LAST_TAIL_BLOCKS
            LAST_TAIL_BLOCKS += 1
            cx, cy = cu.pos(comp)
            w, h = cu.size(comp)
            if cu.is_intra():
                pred = dec.predict_intra(cu, comp)
            else:
                pred = inter_mc.motion_compensation(dec.inter, cu, comp)
            if cu.cbf[comp]:
                reco = np.clip(pred + resi[comp][cy:cy + h, cx:cx + w],
                               0, max_pel)
            else:
                reco = pred
            self.rec.plane_view(comp)[cy:cy + h, cx:cx + w] = reco
