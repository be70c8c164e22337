"""Python facades over the native CABAC engines.

Drop-in replacements for cabac.entropy_decoder.EntropyDecoder and
cabac.entropy_encoder.EntropyEncoder (real-output mode); chosen by the
syntax layer when the native library is available.  Counting-mode
(RDO) encoders stay in Python — their per-element work is light and
they are cloned constantly — but their residual-block bit counting is
routed through the native write path via `count_write_coefficients`.
"""
import ctypes

import numpy as np

from . import LIB, ctx_ptr, family_offsets, i32_ptr, restr_bits

_OFFSETS_ARR = None


def _offsets_ptr():
    global _OFFSETS_ARR
    if _OFFSETS_ARR is None:
        _OFFSETS_ARR = family_offsets()
    return i32_ptr(_OFFSETS_ARR)


class NativeEntropyDecoder:
    """Mirror of cabac.entropy_decoder.EntropyDecoder over xvcn."""

    __slots__ = ("bit_reader", "state", "ctx_update", "_buf", "_h", "_sp")

    def __init__(self, bit_reader, ctx_state, ctx_update=True):
        self.bit_reader = bit_reader
        self.state = ctx_state
        self.ctx_update = ctx_update
        self._buf = bit_reader.buf
        self._h = None
        self._sp = ctx_ptr(ctx_state)

    def start(self):
        assert self.bit_reader.bit_mask == 0x80
        self._h = LIB.xvcn_dec_create(self._buf, len(self._buf),
                                      self.bit_reader.pos,
                                      1 if self.ctx_update else 0)

    def __del__(self):
        if getattr(self, "_h", None):
            LIB.xvcn_dec_destroy(self._h)
            self._h = None

    def decode_bin(self, ctx):
        return LIB.xvcn_dec_decode_bin(self._h, self._sp, ctx)

    def decode_bypass(self):
        return LIB.xvcn_dec_decode_bypass(self._h)

    def decode_bypass_bins(self, num_bins):
        return LIB.xvcn_dec_decode_bypass_bins(self._h, num_bins)

    def decode_bin_trm(self):
        return LIB.xvcn_dec_decode_bin_trm(self._h)

    def finish(self):
        LIB.xvcn_dec_finish(self._h)
        if LIB.xvcn_dec_get_error(self._h):
            raise ValueError("corrupt bitstream")
        # Sync the Python BitReader to continue after the CABAC payload.
        self.bit_reader.pos = LIB.xvcn_dec_get_pos(self._h)
        self.bit_reader.bit_mask = 0x80

    def check_error(self):
        if LIB.xvcn_dec_get_error(self._h):
            raise ValueError("corrupt bitstream")

    def read_coefficients_native(self, restr_mask, width, height,
                                 subblock_shift, is_luma, scan_order, dst):
        n = LIB.xvcn_read_coefficients(
            self._h, self._sp, _offsets_ptr(), restr_mask, width, height,
            subblock_shift, 1 if is_luma else 0, scan_order, i32_ptr(dst),
            dst.shape[1])
        if LIB.xvcn_dec_get_error(self._h):
            raise ValueError("corrupt bitstream")
        return n


class NativeEntropyEncoder:
    """Mirror of cabac.entropy_encoder.EntropyEncoder (real mode)."""

    __slots__ = ("bit_writer", "state", "ctx_update", "_h", "_sp")

    def __init__(self, bit_writer, ctx_state, ctx_update=True):
        assert bit_writer is not None
        self.bit_writer = bit_writer
        self.state = ctx_state
        self.ctx_update = ctx_update
        self._sp = ctx_ptr(ctx_state)
        self._h = LIB.xvcn_enc_create(1 if ctx_update else 0, 0, 1 << 16)

    def __del__(self):
        if getattr(self, "_h", None):
            LIB.xvcn_enc_destroy(self._h)
            self._h = None

    def get_num_written_bits(self):
        return LIB.xvcn_enc_get_frac_bits(self._h) >> 15

    def get_fractional_bits(self):
        return LIB.xvcn_enc_get_frac_bits(self._h) & 32767

    @property
    def frac_bits(self):
        return LIB.xvcn_enc_get_frac_bits(self._h)

    def reset_bit_counting(self):
        LIB.xvcn_enc_set_frac_bits(self._h,
                                   LIB.xvcn_enc_get_frac_bits(self._h)
                                   & 32767)

    def encode_bin(self, binval, ctx):
        LIB.xvcn_enc_encode_bin(self._h, self._sp, binval, ctx)

    def encode_bypass(self, binval):
        LIB.xvcn_enc_encode_bypass(self._h, binval)

    def encode_bypass_bins(self, binvals, num_bins):
        LIB.xvcn_enc_encode_bypass_bins(self._h, binvals & 0xFFFFFFFF,
                                        num_bins)

    def encode_bin_trm(self, binval):
        LIB.xvcn_enc_encode_bin_trm(self._h, binval)

    def finish(self):
        LIB.xvcn_enc_finish(self._h)
        n = LIB.xvcn_enc_get_out_len(self._h)
        out = np.empty(n, dtype=np.uint8)
        LIB.xvcn_enc_copy_out(self._h, ctx_ptr(out))
        self.bit_writer.write_bytes(out.tobytes())

    def write_coefficients_native(self, restr_mask, width, height,
                                  subblock_shift, is_luma, scan_order, src):
        return LIB.xvcn_write_coefficients(
            self._h, self._sp, _offsets_ptr(), restr_mask, width, height,
            subblock_shift, 1 if is_luma else 0, scan_order, i32_ptr(src),
            src.shape[1])


def count_write_coefficients(py_enc, restr_mask, width, height,
                             subblock_shift, is_luma, scan_order, src):
    """Residual bit counting for a Python counting-mode EntropyEncoder:
    run the native writer in counting mode against the shared context
    array, then fold the fractional bits back into the Python engine."""
    h = LIB.xvcn_enc_create(1 if py_enc.ctx_update else 0, 1, 0)
    try:
        LIB.xvcn_enc_set_frac_bits(h, py_enc.frac_bits)
        n = LIB.xvcn_write_coefficients(
            h, ctx_ptr(py_enc.state), _offsets_ptr(), restr_mask, width,
            height, subblock_shift, 1 if is_luma else 0, scan_order,
            i32_ptr(src), src.shape[1])
        py_enc.frac_bits = LIB.xvcn_enc_get_frac_bits(h)
        return n
    finally:
        LIB.xvcn_enc_destroy(h)


def quant_rdo_native(ctx_state, restr_mask, width, height, subblock_shift,
                     is_luma, scan_order, bitdepth, qp_per, fwd_scale,
                     inv_scale, lambda_fp, cbf_ctx_idx, rd_factor, src, out):
    return LIB.xvcn_quant_rdo(
        ctx_ptr(ctx_state), _offsets_ptr(), restr_mask, width, height,
        subblock_shift, 1 if is_luma else 0, scan_order, bitdepth, qp_per,
        fwd_scale, inv_scale, lambda_fp, cbf_ctx_idx, rd_factor,
        i32_ptr(src), i32_ptr(out), out.shape[1])
