"""CU reconstruction: predict + dequant + inverse transform + add.

Behavioral equivalent of the reference CU decoder
(ref: src/xvc_dec_lib/cu_decoder.cc).  Uses the exact-integer numpy ops;
the batched JAX path mirrors these kernels for TPU execution.
"""
import numpy as np

from .. import constants as k
from ..ops import intra_pred as ip
from ..ops import inter_pred as mc
from ..ops import quant as q
from ..ops import transform as tx
from .cu_reader import CuReader


class CuDecoder:
    def __init__(self, rec_pic, pic_data, restrictions):
        self.rec = rec_pic
        self.pic = pic_data
        self.restr = restrictions
        self.min_pel = 0
        self.max_pel = (1 << rec_pic.bitdepth) - 1
        self.cu_reader = CuReader(pic_data, restrictions)
        self.inter = mc.InterPredictor(pic_data, rec_pic, rec_pic.bitdepth,
                                       restrictions)
        self._lm_luma_cache = None

    def decode_ctu(self, rsaddr, reader):
        self._read_ctu(rsaddr, reader)
        ctu = self.pic.get_ctu(k.CuTree.PRIMARY, rsaddr)
        self.pic.clear_mark_cu_in_pic(ctu)
        self._decompress_cu(ctu)
        if self.pic.has_secondary_cu_tree():
            ctu2 = self.pic.get_ctu(k.CuTree.SECONDARY, rsaddr)
            self.pic.clear_mark_cu_in_pic(ctu2)
            self._decompress_cu(ctu2)

    def _read_ctu(self, rsaddr, reader):
        ctu = self.pic.get_ctu(k.CuTree.PRIMARY, rsaddr)
        read_delta_qp = self.cu_reader.read_ctu(ctu, reader)
        if self.pic.has_secondary_cu_tree():
            ctu2 = self.pic.get_ctu(k.CuTree.SECONDARY, rsaddr)
            read_delta_qp |= self.cu_reader.read_ctu(ctu2, reader)
        qp_raw = self.pic.pic_qp.get_qp_raw(0)
        if self.pic.adaptive_qp > 0 and read_delta_qp:
            predicted_qp = ctu.get_predicted_qp()
            qp_raw = reader.read_qp(predicted_qp, qp_raw,
                                    self.pic.adaptive_qp)
        elif self.pic.adaptive_qp == 2:
            qp_raw = ctu.get_predicted_qp()
        self._set_qp_recursive(ctu, qp_raw)
        if self.pic.has_secondary_cu_tree():
            ctu2 = self.pic.get_ctu(k.CuTree.SECONDARY, rsaddr)
            self._set_qp_recursive(ctu2, qp_raw)
        if self.restr.disable_ext_implicit_last_ctu:
            if reader.read_end_of_slice():
                raise ValueError("unexpected end of slice")

    def _set_qp_recursive(self, cu, qp_raw):
        cu.qp = self.pic.get_qp_obj(qp_raw)
        for sub in cu.sub_cus:
            if sub is not None:
                self._set_qp_recursive(sub, qp_raw)

    def _decompress_cu(self, cu):
        if cu.split != k.SplitType.NONE:
            for sub in cu.sub_cus:
                if sub is not None:
                    sub.qp = cu.qp
                    self._decompress_cu(sub)
        else:
            self.pic.mark_used_in_pic(cu)
            self._lm_luma_cache = None
            for comp in self.pic.get_components(cu.cu_tree):
                self._decompress_component(cu, comp, cu.qp)

    def _decompress_component(self, cu, comp, qp):
        cx, cy = cu.pos(comp)
        width, height = cu.size(comp)
        cbf = cu.cbf[comp]
        plane = self.rec.plane_view(comp)

        if cu.is_intra():
            pred = self.predict_intra(cu, comp)
        else:
            self.inter.calculate_mv(cu)
            pred = self.inter.motion_compensation(cu, comp)
        if not cbf:
            plane[cy:cy + height, cx:cx + width] = pred
            return

        coeff = cu.get_coeff(comp)
        dq = q.dequant_np(coeff, comp, qp, width, height, self.rec.bitdepth)
        if not cu.transform_skip[comp]:
            resi = self._inverse_transform(cu, comp, dq)
        else:
            resi = tx.transform_skip_inverse_np(dq, self.rec.bitdepth)
        reco = np.clip(pred + resi, self.min_pel, self.max_pel)
        plane[cy:cy + height, cx:cx + width] = reco

    def _inverse_transform(self, cu, comp, dq):
        t0 = cu.get_transform_type(comp, 0)
        t1 = cu.get_transform_type(comp, 1)
        high_precision = not self.restr.disable_ext2_transform_high_precision
        can_dst_4x4 = (comp == 0 and cu.is_intra() and
                       t0 == k.TransformType.DEFAULT and
                       t1 == k.TransformType.DEFAULT)
        width, height = cu.size(comp)
        if can_dst_4x4 and width == 4 and height == 4 and \
                not self.restr.disable_ext2_transform_dst:
            return tx.inverse_transform_dst4_np(dq, self.rec.bitdepth,
                                                high_precision)
        return tx.inverse_transform_np(dq, t0, t1, self.rec.bitdepth,
                                       high_precision,
                                       dc_only=cu.dc_only[comp])

    # ---- intra ----
    def predict_intra(self, cu, comp):
        mode = cu.get_intra_mode(comp)
        restr = self.restr
        if mode == k.INTRA_MODE_LM_CHROMA:
            return self._pred_lm_chroma(cu, comp)
        cx, cy = cu.pos(comp)
        width, height = cu.size(comp)
        plane = self.rec.plane_view(comp)
        has_left = cx > 0
        has_above = cy > 0
        has_above_left = cx > 0 and cy > 0
        size_below_left = cu.get_cu_size_below_left(comp) if has_left else 0
        size_above_right = cu.get_cu_size_above_right(comp) if has_above \
            else 0
        top, left = ip.compute_ref_samples(
            width, height, plane, cx, cy, has_left, has_above,
            has_above_left, size_below_left, size_above_right,
            self.rec.bitdepth, restr)
        if restr.disable_intra_planar and mode == 0:
            mode = 1
        use_filt = False
        if comp == 0:
            use_filt = ip.use_filtered_ref_samples(cu.width, cu.height,
                                                   mode, restr)
        if use_filt:
            ftop, fleft = ip.filter_ref_samples(width, height, top, left)
        else:
            ftop, fleft = top, left
        post_filter = comp == 0 and width <= 16 and height <= 16
        if mode == 0:
            return ip.pred_planar(width, height, ftop, fleft)
        if mode == 1:
            return ip.pred_dc(width, height, top, left, post_filter, restr)
        return ip.pred_angular(width, height, mode, ftop, fleft,
                               post_filter, self.rec.bitdepth, restr)

    def _pred_lm_chroma(self, cu, comp):
        """(ref: intra_prediction.cc:560-585)"""
        cx, cy = cu.pos(comp)
        width, height = cu.size(comp)
        max_val = (1 << self.rec.bitdepth) - 1
        if comp == 1 or self._lm_luma_cache is None:
            self._lm_luma_cache = self._rescale_luma(cu, comp)
        luma_sub = self._lm_luma_cache
        chroma_plane = self.rec.plane_view(comp)
        has_above = cu.pos_y > 0
        has_left = cu.pos_x > 0
        src_above = chroma_plane[cy - 1, cx:cx + width] if has_above else None
        src_left = chroma_plane[cy:cy + height, cx - 1] if has_left else None
        ref_above = luma_sub[0, 1:1 + width] if has_above else None
        ref_left = luma_sub[1:1 + height, 0] if has_left else None
        scale, offset, shift = ip.derive_lm_params(
            width, height, has_above, has_left,
            src_above, src_left, ref_above, ref_left, self.rec.bitdepth)
        block = luma_sub[1:1 + height, 1:1 + width].astype(np.int64)
        pred = ((scale * block) >> shift) + offset
        return np.clip(pred, 0, max_val).astype(np.int32)

    def _rescale_luma(self, cu, comp):
        """Downscale reconstructed luma to chroma grid incl. -1 row/col
        (ref: intra_prediction.cc:873-954).  Returns array with [0,:] the
        above row and [:,0] the left column (offset by 1,1)."""
        luma_plane = self.rec.plane_view(0)
        lx, ly = cu.pos_x, cu.pos_y
        luma_w, luma_h = cu.width, cu.height
        width, height = cu.size(comp)
        has_above = ly > 0
        has_left = lx > 0
        out = np.zeros((height + 1, width + 1), dtype=np.int32)
        cf = self.pic.chroma_format
        start_y = -1 if has_above else 0
        start_x = 0 if has_left else 1

        def src(yy, xx):
            return int(luma_plane[ly + yy, lx + xx])

        if cf == k.ChromaFormat.YUV420:
            if has_left:
                for y in range(start_y, height):
                    yy = 2 * y
                    s = (src(yy, -3) + 2 * src(yy, -2) + src(yy, -1) +
                         src(yy + 1, -3) + 2 * src(yy + 1, -2) +
                         src(yy + 1, -1))
                    out[y + 1, 0] = (s + 4) >> 3
            else:
                for y in range(start_y, height):
                    yy = 2 * y
                    s = src(yy, 0) + src(yy + 1, 0)
                    out[y + 1, 1] = (s + 1) >> 1
            for y in range(start_y, height):
                yy = 2 * y
                for x in range(start_x, width):
                    s = (src(yy, 2 * x - 1) + 2 * src(yy, 2 * x) +
                         src(yy, 2 * x + 1) + src(yy + 1, 2 * x - 1) +
                         2 * src(yy + 1, 2 * x) + src(yy + 1, 2 * x + 1))
                    out[y + 1, x + 1] = (s + 4) >> 3
        elif cf == k.ChromaFormat.YUV444:
            if has_above:
                out[0, 1:1 + width] = \
                    luma_plane[ly - 1, lx:lx + width]
            if has_left:
                out[1:1 + height, 0] = \
                    luma_plane[ly:ly + height, lx - 1]
            out[1:1 + height, 1:1 + width] = \
                luma_plane[ly:ly + height, lx:lx + width]
        else:  # 4:2:2
            if has_left:
                for y in range(start_y, height):
                    s = src(y, -3) + 2 * src(y, -2) + src(y, -1)
                    out[y + 1, 0] = (s + 2) >> 2
            else:
                for y in range(start_y, height):
                    s = src(y, 0) + src(y, 1)
                    out[y + 1, 1] = (s + 1) >> 1
            for y in range(start_y, height):
                for x in range(start_x, width):
                    s = (src(y, 2 * x - 1) + 2 * src(y, 2 * x) +
                         src(y, 2 * x + 1))
                    out[y + 1, x + 1] = (s + 2) >> 2
        return out
