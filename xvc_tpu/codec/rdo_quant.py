"""Quantization with rate-distortion optimization + sign-bit hiding.

Behavioral equivalent of the reference RDO quantizer
(ref: src/xvc_enc_lib/rdo_quant.cc).  Context-accurate fractional-bit
costs come from the shared CABAC entropy-bits table.
"""
import numpy as np

from .. import constants as k
from .. import native as _native
from .. import scan as scan_mod
from ..cabac import context_model as cm
from ..ops import quant as q

LAMBDA_PRECISION = 16
_I64_MAX = (1 << 63) - 1


def _bit_cost(bits, lambda_fp):
    return (bits * lambda_fp) >> LAMBDA_PRECISION


def _ebits(state, binval):
    return int(cm.ENTROPY_BITS[int(state) ^ binval])


class _CodeState:
    __slots__ = ("ctx_set", "c1", "c2", "c1_idx", "c2_idx", "golomb_rice_k")

    def __init__(self):
        self.ctx_set = 0
        self.c1 = 1
        self.c2 = 0
        self.c1_idx = 0
        self.c2_idx = 0
        self.golomb_rice_k = 0


class RdoQuant:
    def __init__(self, bitdepth, encoder_settings):
        self.bitdepth = bitdepth
        self.settings = encoder_settings

    def quant_fast(self, cu, comp, qp, pic_type, src, out):
        """(ref: rdo_quant.cc:156-201). src/out are (h, w) int arrays."""
        height, width = src.shape
        wl2, hl2 = width.bit_length() - 1, height.bit_length() - 1
        size_rounding_bias = ((wl2 + hl2) % 2) != 0
        transform_shift = q.get_transform_shift(width, height, self.bitdepth)
        shift = q.QUANT_SHIFT + qp.get_qp_per(comp) + transform_shift + \
            (7 if size_rounding_bias else 0)
        scale = qp.get_fwd_scale(comp) * (181 if size_rounding_bias else 1)
        offset = (171 if pic_type == k.PicturePredictionType.INTRA
                  else 85) << (shift - 9)
        s = src.astype(np.int64)
        sign = np.where(s < 0, -1, 1)
        abs_coeff = np.abs(s)
        level = (abs_coeff * scale + offset) >> shift
        out[:, :] = np.clip(level * sign, k.INT16_MIN, k.INT16_MAX)
        delta = ((abs_coeff * scale) - (level << shift)) >> (shift - 8)
        delta = delta.astype(np.int16).astype(np.int64)  # Coeff cast
        num_non_zero = int(np.count_nonzero(level))
        restr = cu.pic.restrictions
        if not restr.disable_transform_sign_hiding and \
                num_non_zero > 1 and width >= 4 and height >= 4:
            num_non_zero = self._sign_hide_fast(cu, comp, width, height,
                                                src, delta, out)
        return num_non_zero

    def _sign_hide_fast(self, cu, comp, width, height, src, delta, out):
        """(ref: rdo_quant.cc:448-573)"""
        restr = cu.pic.restrictions
        subblock_shift = k.SUBBLOCK_SHIFT
        subblock_size = 1 << (2 * subblock_shift)
        intra_mode = cu.get_intra_mode(comp) if cu.is_intra() else 0
        scan_order = scan_mod.determine_scan_order(cu, comp == 0, intra_mode,
                                                   restr)
        scan_table = scan_mod.SCAN_COEFF_4X4[scan_order]
        sw = width >> subblock_shift
        sh = height >> subblock_shift
        sub_scan = scan_mod.derive_subblock_scan(scan_order, sw, sh)
        num_non_zero = int(np.count_nonzero(out))
        last_subblock = -1
        mask = (1 << subblock_shift) - 1
        for si in range(sw * sh - 1, -1, -1):
            sscan = sub_scan[si]
            sy = sscan // sw
            sx = sscan - sy * sw
            px, py = sx << subblock_shift, sy << subblock_shift

            def coords(idx):
                so = scan_table[idx]
                return py + (so >> subblock_shift), px + (so & mask)

            first_nz, last_nz = subblock_size, -1
            abs_sum = 0
            for ci in range(subblock_size):
                yy, xx = coords(ci)
                c = int(out[yy, xx])
                if c:
                    first_nz = min(first_nz, ci)
                    last_nz = max(last_nz, ci)
                    abs_sum += c
            if last_nz >= 0 and last_subblock == -1:
                last_subblock = 1
            if last_nz - first_nz > k.SIGN_HIDING_THRESHOLD:
                yy, xx = coords(first_nz)
                sign = 0 if int(out[yy, xx]) > 0 else 1
                if sign != (abs_sum & 1):
                    min_cost = 32767
                    min_change = 0
                    min_index = -1
                    start = last_nz if last_subblock == 1 else \
                        subblock_size - 1
                    for ci in range(start, -1, -1):
                        yy, xx = coords(ci)
                        if int(out[yy, xx]) != 0:
                            if int(delta[yy, xx]) > 0:
                                curr_cost = -int(delta[yy, xx])
                                curr_change = 1
                            else:
                                if ci == first_nz and \
                                        abs(int(out[yy, xx])) == 1:
                                    curr_cost = 32767
                                    curr_change = 0
                                else:
                                    curr_cost = int(delta[yy, xx])
                                    curr_change = -1
                        else:
                            if ci < first_nz:
                                this_sign = 0 if int(src[yy, xx]) >= 0 else 1
                                if this_sign != sign:
                                    curr_cost = 32767
                                    curr_change = 0
                                else:
                                    curr_cost = -int(delta[yy, xx])
                                    curr_change = 1
                            else:
                                curr_cost = -int(delta[yy, xx])
                                curr_change = 1
                        if curr_cost < min_cost:
                            min_cost = curr_cost
                            min_change = curr_change
                            min_index = ci
                    yy, xx = coords(min_index)
                    if int(out[yy, xx]) in (k.INT16_MIN, k.INT16_MAX):
                        min_change = -1
                    if not int(out[yy, xx]):
                        num_non_zero += 1
                    if int(src[yy, xx]) >= 0:
                        out[yy, xx] += min_change
                    else:
                        out[yy, xx] -= min_change
                    if not int(out[yy, xx]):
                        num_non_zero -= 1
            if last_subblock == 1:
                last_subblock = 0
        return num_non_zero

    # ---- full RDO quantization ----

    def quant_rdo(self, cu, comp, qp, pic_type, writer, src, out):
        w, h = cu.size(comp)
        if w == 2 or h == 2:
            if not self.settings.rdo_quant_2x2:
                return self.quant_fast(cu, comp, qp, pic_type, src, out)
            subblock_shift = 1
        else:
            subblock_shift = k.SUBBLOCK_SHIFT
        if _native.available():
            return self._quant_rdo_native(cu, comp, qp, writer, src, out,
                                          subblock_shift)
        return self._quant_rdo(cu, comp, qp, pic_type, writer, src, out,
                               subblock_shift)

    def _quant_rdo_native(self, cu, comp, qp, writer, src, out,
                          subblock_shift):
        from ..cabac.contexts import OFFSETS
        from ..native.engines import quant_rdo_native
        restr = cu.pic.restrictions
        height, width = src.shape
        is_luma = comp == 0
        intra_mode = cu.get_intra_mode(comp) if cu.is_intra() else 0
        scan_order = scan_mod.determine_scan_order(cu, is_luma, intra_mode,
                                                   restr)
        if not is_luma:
            cbf_idx = OFFSETS["cu_cbf_chroma"]
        elif cu.is_intra():
            cbf_idx = OFFSETS["cu_cbf_luma"]
        else:
            cbf_idx = OFFSETS["cu_root_cbf"]
        lam = qp.get_lambda_scaled(comp)
        lambda_fp = int(lam * (1 << LAMBDA_PRECISION) + 0.5)
        inv_scale = qp.get_inv_scale(comp)
        subblock_size = 1 << (2 * subblock_shift)
        rd_factor = int(float(inv_scale) * float(inv_scale) / lam /
                        subblock_size / (1 << (2 * (self.bitdepth - 8))) +
                        0.5) if lam > 0 else 0
        if src.dtype != np.int32 or not src.flags["C_CONTIGUOUS"]:
            src = np.ascontiguousarray(src, dtype=np.int32)
        assert out.dtype == np.int32 and out.flags["C_CONTIGUOUS"]
        return quant_rdo_native(
            writer.ctx.state, _native.restr_bits(restr), width, height,
            subblock_shift, is_luma, scan_order, self.bitdepth,
            qp.get_qp_per(comp), qp.get_fwd_scale(comp), inv_scale,
            lambda_fp, cbf_idx, rd_factor, src, out)

    def _quant_rdo(self, cu, comp, qp, pic_type, writer, src, out,
                   subblock_shift):
        restr = cu.pic.restrictions
        height, width = src.shape
        width_log2 = width.bit_length() - 1
        height_log2 = height.bit_length() - 1
        subblock_width = width >> subblock_shift
        subblock_height = height >> subblock_shift
        subblock_size = 1 << (2 * subblock_shift)
        subblock_mask = (1 << subblock_shift) - 1
        is_luma = comp == 0
        transform_shift = q.get_transform_shift(width, height, self.bitdepth)
        size_rounding_bias = 1 if ((width_log2 + height_log2) % 2) else 0
        shift = q.QUANT_SHIFT + qp.get_qp_per(comp) + transform_shift
        size_bias_shift = 7 if size_rounding_bias else 0
        size_bias_offset = (1 << (size_bias_shift - 1)) \
            if size_rounding_bias else 0
        scale = qp.get_fwd_scale(comp) * (181 if size_rounding_bias else 1)
        cost_scale = cm.FRAC_BITS_PRECISION - 2 * transform_shift - \
            2 * (self.bitdepth - 8) + 2 * size_rounding_bias
        lambda_fp = int(qp.get_lambda_scaled(comp) *
                        (1 << LAMBDA_PRECISION) + 0.5)
        ctx = writer.ctx
        state = ctx.state
        intra_mode = cu.get_intra_mode(comp) if cu.is_intra() else 0
        scan_order = scan_mod.determine_scan_order(cu, is_luma, intra_mode,
                                                   restr)
        fwd_shift = shift + size_bias_shift
        fwd_offset = 1 << (fwd_shift - 1)

        inv_shift = q.IQUANT_SHIFT - transform_shift + \
            (8 if size_rounding_bias else 0)
        inv_scale = qp.get_inv_scale(comp) * (181 if size_rounding_bias
                                              else 1)

        def fwd_quant(abs_coeff):
            return (abs_coeff * scale + fwd_offset) >> fwd_shift

        def inv_quant(level):
            if inv_shift > 0:
                c = (level * inv_scale + (1 << (inv_shift - 1))) >> inv_shift
            else:
                c = (level * inv_scale) << (-inv_shift)
            return min(max(c, k.INT16_MIN), k.INT16_MAX)

        scan_table = scan_mod.SCAN_COEFF_2X2[scan_order] \
            if subblock_shift == 1 else scan_mod.SCAN_COEFF_4X4[scan_order]
        sub_scan = scan_mod.derive_subblock_scan(scan_order, subblock_width,
                                                 subblock_height)
        nbr_subblocks = subblock_width * subblock_height

        subblock_csbf = [0] * nbr_subblocks
        csbf_bits_to_zero = [0] * nbr_subblocks
        n = width * height
        err_dist = [0] * n
        sig_rate = [0] * n
        rate_up = [0] * n
        rate_down = [0] * n
        coeff_cost_to_zero = [0] * n
        coeff_sig_bits = [0] * n

        code_state = _CodeState()
        last_pos_index = -1
        comp_zero_dist = 0
        comp_code_cost = 0

        for si in range(nbr_subblocks - 1, -1, -1):
            sscan = sub_scan[si]
            ssy = sscan // subblock_width
            ssx = sscan - ssy * subblock_width
            spx, spy = ssx << subblock_shift, ssy << subblock_shift
            sub_index = si << (2 * subblock_shift)
            last_c1 = code_state.c1
            code_state = _CodeState()
            code_state.ctx_set = 2 if (sub_index > 0 and is_luma) else 0
            if last_c1 == 0:
                code_state.ctx_set += 1

            subblock_zero_dist = 0
            subblock_code_cost = 0
            csbf_ctx, pattern_sig_ctx = ctx.get_subblock_csbf_ctx(
                is_luma, subblock_csbf, ssx, ssy, subblock_width,
                subblock_height)
            num_non_zero = 0

            for off in range(subblock_size - 1, -1, -1):
                so = scan_table[off]
                scan_x = spx + (so & subblock_mask)
                scan_y = spy + (so >> subblock_shift)
                index = sub_index + off
                abs_coeff = abs(int(src[scan_y, scan_x]))
                coeff_zero_cost = (abs_coeff * abs_coeff) << cost_scale
                subblock_zero_dist += coeff_zero_cost
                quant_coeff = fwd_quant(abs_coeff)
                if quant_coeff and last_pos_index == -1:
                    last_pos_index = index
                elif last_pos_index == -1:
                    out[scan_y, scan_x] = 0
                    subblock_code_cost += coeff_zero_cost
                    continue

                sig_ctx = ctx.get_coeff_sig_ctx(
                    is_luma, pattern_sig_ctx, scan_order, scan_x, scan_y,
                    out, width_log2, height_log2)
                c1_ctx = ctx.get_coeff_greater1_ctx(
                    is_luma, code_state.ctx_set, code_state.c1, scan_x,
                    scan_y, index == last_pos_index, out, width, height)
                c2_ctx = ctx.get_coeff_greater2_ctx(
                    is_luma, code_state.ctx_set, scan_x, scan_y,
                    index == last_pos_index, out, width, height)
                if not restr.disable_ext2_cabac_alt_residual_ctx:
                    code_state.golomb_rice_k = ctx.get_coeff_golomb_rice_k(
                        scan_x, scan_y, width, height, out)
                sig0_bits = _ebits(state[sig_ctx], 0)
                sig1_bits = _ebits(state[sig_ctx], 1)
                if last_pos_index == index or \
                        (sub_index > 0 and off == 0 and num_non_zero == 0):
                    sig1_bits = 0

                best_cost = _I64_MAX
                best_cost_sig = 0
                best_level = quant_coeff
                if quant_coeff > 0:
                    best_cost_sig = sig1_bits
                    best_level, best_cost = self._quant_coeff_rdo(
                        restr, abs_coeff, quant_coeff, code_state, sig1_bits,
                        lambda_fp, cost_scale, state[c1_ctx], state[c2_ctx],
                        inv_quant)
                if last_pos_index != index and quant_coeff < 3:
                    cost = coeff_zero_cost + _bit_cost(sig0_bits, lambda_fp)
                    if cost <= best_cost:
                        best_cost = cost
                        best_cost_sig = sig0_bits
                        best_level = 0
                out[scan_y, scan_x] = best_level
                coeff_cost_to_zero[index] = coeff_zero_cost - best_cost
                coeff_sig_bits[index] = best_cost_sig
                subblock_code_cost += best_cost
                orig_scaled = (abs_coeff * scale + size_bias_offset) >> \
                    size_bias_shift
                quant_err = orig_scaled - (best_level << shift)
                e = (quant_err >> (shift - 8)) & 0xFFFF  # Coeff (int16) cast
                err_dist[index] = e - 0x10000 if e >= 0x8000 else e
                sig_rate[index] = (sig1_bits - sig0_bits) \
                    if last_pos_index != index else 0
                if best_level:
                    subblock_csbf[sscan] = 1
                    num_non_zero += 1
                    lvl_rate = self._abs_level_bits(
                        restr, best_level, state[c1_ctx], state[c2_ctx],
                        code_state)
                    rate_up[index] = -lvl_rate + self._abs_level_bits(
                        restr, best_level + 1, state[c1_ctx], state[c2_ctx],
                        code_state)
                    rate_down[index] = -lvl_rate + self._abs_level_bits(
                        restr, best_level - 1, state[c1_ctx], state[c2_ctx],
                        code_state)
                else:
                    rate_up[index] = _ebits(state[c1_ctx], 0)
                self._update_code_state(best_level, code_state)

            zeroed, csbf_bits_to_zero[sscan], subblock_code_cost = \
                self._eval_zero_subblock(
                    sub_index, subblock_size, subblock_csbf[sscan] != 0,
                    state[csbf_ctx], last_pos_index, subblock_zero_dist,
                    lambda_fp, subblock_code_cost)
            if zeroed:
                subblock_csbf[sscan] = 0
                for off in range(subblock_size):
                    so = scan_table[off]
                    out[spy + (so >> subblock_shift),
                        spx + (so & subblock_mask)] = 0
                    coeff_cost_to_zero[sub_index + off] = 0
            comp_code_cost += subblock_code_cost
            comp_zero_dist += subblock_zero_dist

        if last_pos_index < 0:
            return 0

        last_pos_index = self._eval_last_pos(
            cu, comp, scan_order, ctx, last_pos_index, lambda_fp,
            comp_code_cost, comp_zero_dist, out, subblock_csbf,
            csbf_bits_to_zero, coeff_cost_to_zero, coeff_sig_bits,
            subblock_shift, scan_table, sub_scan)
        if last_pos_index < 0:
            out[:, :] = 0
            return 0

        last_subblock_index = last_pos_index - \
            (last_pos_index & (subblock_size - 1))
        for si in range(nbr_subblocks - 1, -1, -1):
            sub_index = si << (2 * subblock_shift)
            if sub_index < last_subblock_index:
                break
            sscan = sub_scan[si]
            ssy = sscan // subblock_width
            ssx = sscan - ssy * subblock_width
            spx, spy = ssx << subblock_shift, ssy << subblock_shift
            last_pos_index_end = 0
            if sub_index == last_subblock_index:
                last_pos_index_end = last_pos_index % subblock_size
            for off in range(subblock_size - 1, last_pos_index_end - 1, -1):
                so = scan_table[off]
                out[spy + (so >> subblock_shift),
                    spx + (so & subblock_mask)] = 0

        num_non_zero = int(np.count_nonzero(out))
        neg = src < 0
        out[neg] = -out[neg]

        if not restr.disable_transform_sign_hiding and num_non_zero > 1 and \
                subblock_shift > 1:
            num_non_zero = self._sign_hide_rdo(
                cu, comp, qp, src, out, err_dist, rate_up, rate_down,
                sig_rate, scan_order, subblock_shift, scan_table, sub_scan)
        return num_non_zero

    def _quant_coeff_rdo(self, restr, orig_coeff, max_level, code_state,
                         sig1_bits, lambda_fp, cost_scale, c1_state,
                         c2_state, inv_quant):
        """(ref: rdo_quant.cc:707-736)"""
        def get_cost(level):
            bits = sig1_bits + self._abs_level_bits(restr, level, c1_state,
                                                    c2_state, code_state)
            dequant = inv_quant(level)
            err = orig_coeff - dequant
            dist = (err * err) << cost_scale
            return dist + _bit_cost(bits, lambda_fp)

        best_cost = _I64_MAX
        best_level = max_level
        if max_level > 1:
            best_cost = get_cost(max_level - 1)
            best_level = max_level - 1
        cost = get_cost(max_level)
        if cost <= best_cost:
            best_cost = cost
            best_level = max_level
        return best_level, best_cost

    def _eval_zero_subblock(self, subblock_index, size, subblock_csbf,
                            csbf_state, last_pos_index, subblock_zero_dist,
                            lambda_fp, subblock_code_cost):
        """(ref: rdo_quant.cc:738-773);
        returns (zeroed, csbf_bits_to_zero, new_code_cost)."""
        if last_pos_index < 0:
            return False, 0, subblock_code_cost
        if subblock_index == 0 or subblock_index + size > last_pos_index:
            return False, 0, subblock_code_cost
        csbf_zero_cost = _ebits(csbf_state, 0)
        csbf_code_bits = _ebits(csbf_state, 1)
        subblock_zero_cost = subblock_zero_dist + \
            _bit_cost(csbf_zero_cost, lambda_fp)
        if subblock_csbf:
            cost_cost = subblock_code_cost + _bit_cost(csbf_code_bits,
                                                       lambda_fp)
            if subblock_zero_cost < cost_cost:
                return True, csbf_zero_cost, subblock_zero_cost
            return False, csbf_code_bits, cost_cost
        return False, csbf_zero_cost, subblock_zero_cost

    def _eval_last_pos(self, cu, comp, scan_order, ctx, last_pos_index,
                       lambda_fp, comp_code_cost, comp_zero_dist, out,
                       subblock_csbf, csbf_bits_to_zero, coeff_cost_to_zero,
                       coeff_sig_bits, subblock_shift, scan_table, sub_scan):
        """(ref: rdo_quant.cc:775-842)"""
        from ..cabac.contexts import OFFSETS
        subblock_size = 1 << (2 * subblock_shift)
        subblock_mask = (1 << subblock_shift) - 1
        width, height = cu.size(comp)
        subblock_width = width >> subblock_shift
        is_luma = comp == 0
        state = ctx.state
        if not is_luma:
            cbf_state = state[OFFSETS["cu_cbf_chroma"]]
        elif cu.is_intra():
            cbf_state = state[OFFSETS["cu_cbf_luma"]]
        else:
            cbf_state = state[OFFSETS["cu_root_cbf"]]
        comp_code_cost += _bit_cost(_ebits(cbf_state, 1), lambda_fp)

        start_last_index = last_pos_index % subblock_size
        best_cost = _I64_MAX
        best_last_pos_plus1 = 0
        stop_search = False
        nbr_subblocks = len(sub_scan)
        for si in range(nbr_subblocks - 1, -1, -1):
            sub_index = si << (2 * subblock_shift)
            if sub_index > last_pos_index:
                continue
            sscan = sub_scan[si]
            comp_code_cost -= _bit_cost(csbf_bits_to_zero[sscan], lambda_fp)
            if not subblock_csbf[sscan]:
                continue
            ssy = sscan // subblock_width
            ssx = sscan - ssy * subblock_width
            spx, spy = ssx << subblock_shift, ssy << subblock_shift
            for off in range(start_last_index, -1, -1):
                so = scan_table[off]
                scan_x = spx + (so & subblock_mask)
                scan_y = spy + (so >> subblock_shift)
                index = sub_index + off
                coeff_val = int(out[scan_y, scan_x])
                if not coeff_val:
                    comp_code_cost += coeff_cost_to_zero[index]
                    continue
                last_pos_bits = self._last_pos_bits(ctx, width, height,
                                                    is_luma, scan_order,
                                                    scan_x, scan_y)
                implicit_sig = coeff_sig_bits[index]
                cost = comp_code_cost + _bit_cost(last_pos_bits, lambda_fp) \
                    - _bit_cost(implicit_sig, lambda_fp)
                if cost < best_cost:
                    best_cost = cost
                    best_last_pos_plus1 = index + 1
                if coeff_val > 1:
                    stop_search = True
                    break
                comp_code_cost += coeff_cost_to_zero[index]
            if stop_search:
                break
            start_last_index = subblock_size - 1
        comp_zero_cost = comp_zero_dist + _bit_cost(_ebits(cbf_state, 0),
                                                    lambda_fp)
        if comp_zero_cost < best_cost:
            return -1
        return best_last_pos_plus1

    def _last_pos_bits(self, ctx, width, height, is_luma, scan_order,
                       last_pos_x, last_pos_y):
        """(ref: rdo_quant.cc:909-953)"""
        state = ctx.state
        bits = 0
        if scan_order == k.ScanOrder.VERTICAL:
            last_pos_x, last_pos_y = last_pos_y, last_pos_x
            width, height = height, width
        group_idx_x = int(scan_mod.LAST_POS_GROUP_IDX[last_pos_x])
        group_idx_y = int(scan_mod.LAST_POS_GROUP_IDX[last_pos_y])
        for i in range(group_idx_x):
            c = ctx.get_coeff_last_pos_ctx(is_luma, width, height, i, True)
            bits += _ebits(state[c], 1)
        if group_idx_x < int(scan_mod.LAST_POS_GROUP_IDX[width - 1]):
            c = ctx.get_coeff_last_pos_ctx(is_luma, width, height,
                                           group_idx_x, True)
            bits += _ebits(state[c], 0)
        for i in range(group_idx_y):
            c = ctx.get_coeff_last_pos_ctx(is_luma, width, height, i, False)
            bits += _ebits(state[c], 1)
        if group_idx_y < int(scan_mod.LAST_POS_GROUP_IDX[height - 1]):
            c = ctx.get_coeff_last_pos_ctx(is_luma, width, height,
                                           group_idx_y, False)
            bits += _ebits(state[c], 0)
        if group_idx_x > 3:
            bits += ((group_idx_x - 2) >> 1) * cm.ENTROPY_BYPASS_BITS
        if group_idx_y > 3:
            bits += ((group_idx_y - 2) >> 1) * cm.ENTROPY_BYPASS_BITS
        return bits

    def _abs_level_bits(self, restr, quant_level, c1_state, c2_state,
                        code_state):
        """(ref: rdo_quant.cc:844-887)"""
        base_level = (2 + (1 if code_state.c2_idx < k.MAX_NUM_C2_FLAGS
                           else 0)) \
            if code_state.c1_idx < k.MAX_NUM_C1_FLAGS else 1
        if not restr.disable_ext2_cabac_alt_residual_ctx:
            threshold = int(
                scan_mod.GOLOMB_RICE_RANGE_EXT[code_state.golomb_rice_k])
        else:
            threshold = k.COEFF_REMAIN_BIN_REDUCTION
        bits_sum = cm.ENTROPY_BYPASS_BITS
        grk = code_state.golomb_rice_k
        if quant_level >= base_level:
            code_number = quant_level - base_level
            if code_number < (threshold << grk):
                length = code_number >> grk
                bits_sum += (length + 1 + grk) * cm.ENTROPY_BYPASS_BITS
            else:
                length = grk
                code_number -= threshold << grk
                while code_number >= (1 << length):
                    code_number -= 1 << length
                    length += 1
                num_bins = length + threshold + length + 1 - grk
                bits_sum += num_bins * cm.ENTROPY_BYPASS_BITS
            if code_state.c1_idx < k.MAX_NUM_C1_FLAGS:
                bits_sum += _ebits(c1_state, 1)
                if code_state.c2_idx < k.MAX_NUM_C2_FLAGS:
                    bits_sum += _ebits(c2_state, 1)
        elif quant_level == 1:
            bits_sum += _ebits(c1_state, 0)
        elif quant_level == 2:
            bits_sum += _ebits(c1_state, 1)
            bits_sum += _ebits(c2_state, 0)
        else:
            return 0
        return bits_sum

    @staticmethod
    def _update_code_state(quant_level, state):
        """(ref: rdo_quant.cc:889-907)"""
        base_level = (2 + (1 if state.c2_idx < k.MAX_NUM_C2_FLAGS else 0)) \
            if state.c1_idx < k.MAX_NUM_C1_FLAGS else 1
        if quant_level >= 1:
            state.c1_idx += 1
        if quant_level >= 2:
            state.c2_idx += 1
            state.c1 = 0
        elif quant_level >= 1 and 0 < state.c1 < 3:
            state.c1 += 1
        if quant_level >= base_level:
            if quant_level > 3 * (1 << state.golomb_rice_k):
                state.golomb_rice_k = min(state.golomb_rice_k + 1, 4)

    def _sign_hide_rdo(self, cu, comp, qp, src, out, err_dist, rate_up,
                       rate_down, sig_rate, scan_order, subblock_shift,
                       scan_table, sub_scan):
        """(ref: rdo_quant.cc:575-705)"""
        width, height = cu.size(comp)
        subblock_mask = (1 << subblock_shift) - 1
        subblock_size = 1 << (2 * subblock_shift)
        subblock_width = width >> subblock_shift
        lambda_f = qp.get_lambda_scaled(comp)
        inv_scale = float(qp.get_inv_scale(comp))
        rd_factor = int(inv_scale * inv_scale / lambda_f / subblock_size /
                        (1 << (2 * (self.bitdepth - 8))) + 0.5)
        num_non_zero = 0
        is_last_subblock = -1
        nbr_subblocks = len(sub_scan)
        for si in range(nbr_subblocks - 1, -1, -1):
            sscan = sub_scan[si]
            ssy = sscan // subblock_width
            ssx = sscan - ssy * subblock_width
            spx, spy = ssx << subblock_shift, ssy << subblock_shift
            sub_index = si << (2 * subblock_shift)

            def coords(off):
                so = scan_table[off]
                return (spy + (so >> subblock_shift),
                        spx + (so & subblock_mask))

            first_in_subblock = subblock_size
            last_in_subblock = -1
            subblock_sum = 0
            for off in range(subblock_size - 1, -1, -1):
                yy, xx = coords(off)
                v = int(out[yy, xx])
                if v:
                    first_in_subblock = min(first_in_subblock, off)
                    last_in_subblock = max(last_in_subblock, off)
                    subblock_sum += v
                    num_non_zero += 1
            if last_in_subblock >= 0 and is_last_subblock == -1:
                is_last_subblock = 1
            if last_in_subblock - first_in_subblock < 4:
                if is_last_subblock == 1:
                    is_last_subblock = 0
                continue
            yy, xx = coords(first_in_subblock)
            first_sign = 0 if int(out[yy, xx]) > 0 else 1
            if first_sign == (subblock_sum & 1):
                if is_last_subblock == 1:
                    is_last_subblock = 0
                continue
            start_off = last_in_subblock if is_last_subblock == 1 else \
                subblock_size - 1
            best_cost = _I64_MAX
            best_level_delta = 0
            best_y = best_x = -1
            for off in range(start_off, -1, -1):
                yy, xx = coords(off)
                index = sub_index + off
                coeff_lvl = int(out[yy, xx])
                if coeff_lvl != 0:
                    cost_inc = rd_factor * (-err_dist[index]) + \
                        rate_up[index]
                    cost_dec = rd_factor * err_dist[index] + \
                        rate_down[index] - \
                        (sig_rate[index] if abs(coeff_lvl) == 1 else 0)
                    if is_last_subblock == 1 and off == last_in_subblock \
                            and abs(coeff_lvl) == 1:
                        cost_dec -= 4 * cm.ENTROPY_BYPASS_BITS
                    if cost_inc < cost_dec:
                        cost = cost_inc
                        level_delta = 1
                    else:
                        level_delta = -1
                        if off == first_in_subblock and \
                                abs(coeff_lvl) == 1:
                            cost = (1 << 31) - 1
                        else:
                            cost = cost_dec
                else:
                    cost = rd_factor * -abs(err_dist[index]) + \
                        rate_up[index] + sig_rate[index] + \
                        cm.ENTROPY_BYPASS_BITS
                    level_delta = 1
                    if off < first_in_subblock:
                        sign = 0 if int(src[yy, xx]) >= 0 else 1
                        if sign != first_sign:
                            cost = (1 << 31) - 1
                if cost < best_cost:
                    best_cost = cost
                    best_level_delta = level_delta
                    best_y, best_x = yy, xx
            if int(out[best_y, best_x]) in (32767, -32768):
                best_level_delta = -1
            if not int(out[best_y, best_x]):
                num_non_zero += 1
            if int(src[best_y, best_x]) >= 0:
                out[best_y, best_x] += best_level_delta
            else:
                out[best_y, best_x] -= best_level_delta
            if not int(out[best_y, best_x]):
                num_non_zero -= 1
            if is_last_subblock == 1:
                is_last_subblock = 0
        return num_non_zero
