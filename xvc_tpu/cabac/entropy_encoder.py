"""Binary arithmetic encoder with fractional-bit counting mode.

Behavioral equivalent of the reference arithmetic encoder
(ref: src/xvc_enc_lib/entropy_encoder.cc).  With bit_writer=None the
encoder only accumulates fractional bits (RDO counting mode); contexts
still adapt, exactly like the reference RdoSyntaxWriter.
"""
import numpy as np

from .context_model import (ENTROPY_BITS, ENTROPY_BYPASS_BITS,
                            NEXT_STATE_LPS, NEXT_STATE_MPS, RANGE_TABLE,
                            RENORM_TABLE)

_ENTROPY_BITS_TRM0 = int(ENTROPY_BITS[126])
_ENTROPY_BITS_TRM1 = int(ENTROPY_BITS[127])


class EntropyEncoder:
    __slots__ = ("bit_writer", "state", "ctx_update", "low", "range",
                 "buffered_byte", "num_buffered_bytes", "bits_left",
                 "frac_bits")

    def __init__(self, bit_writer, ctx_state, ctx_update=True,
                 written_bits=0, fractional_bits=0):
        self.bit_writer = bit_writer
        self.state = ctx_state
        self.ctx_update = ctx_update
        self.start()
        self.frac_bits = (written_bits << 15) | (fractional_bits & 32767)

    def start(self):
        self.low = 0
        self.range = 510
        self.bits_left = 23
        self.num_buffered_bytes = 0
        self.buffered_byte = 0xFF
        self.frac_bits = 0

    def get_num_written_bits(self):
        return self.frac_bits >> 15

    def get_fractional_bits(self):
        return self.frac_bits & 32767

    def reset_bit_counting(self):
        self.frac_bits &= 32767

    def encode_bin(self, binval, ctx):
        state = int(self.state[ctx])
        mps = state & 1
        self.frac_bits += int(ENTROPY_BITS[state ^ binval])
        if self.bit_writer is None:
            if self.ctx_update:
                self.state[ctx] = NEXT_STATE_LPS[state] if binval != mps \
                    else NEXT_STATE_MPS[state]
            return
        lps = int(RANGE_TABLE[state >> 1][(self.range >> 6) & 3])
        self.range -= lps
        if binval != mps:
            num_bits = int(RENORM_TABLE[lps >> 3])
            self.low += self.range
            self.range = lps
            if self.ctx_update:
                self.state[ctx] = NEXT_STATE_LPS[state]
        else:
            num_bits = 1 if self.range < 256 else 0
            if self.ctx_update:
                self.state[ctx] = NEXT_STATE_MPS[state]
        self.low <<= num_bits
        self.range <<= num_bits
        self.bits_left -= num_bits
        if num_bits and self.bits_left < 12:
            self._write_out()

    def encode_bypass(self, binval):
        self.frac_bits += ENTROPY_BYPASS_BITS
        if self.bit_writer is None:
            return
        self.low <<= 1
        if binval:
            self.low += self.range
        self.bits_left -= 1
        if self.bits_left < 12:
            self._write_out()

    def encode_bypass_bins(self, binvals, num_bins):
        self.frac_bits += ENTROPY_BYPASS_BITS * num_bins
        if self.bit_writer is None:
            return
        while num_bins > 8:
            num_bins -= 8
            pattern = binvals >> num_bins
            self.low <<= 8
            self.low += self.range * pattern
            binvals -= pattern << num_bins
            self.bits_left -= 8
            if self.bits_left < 12:
                self._write_out()
        self.low <<= num_bins
        self.low += self.range * binvals
        self.bits_left -= num_bins
        if self.bits_left < 12:
            self._write_out()

    def encode_bin_trm(self, binval):
        self.frac_bits += _ENTROPY_BITS_TRM1 if binval else _ENTROPY_BITS_TRM0
        if self.bit_writer is None:
            return
        self.range -= 2
        if binval:
            self.low += self.range
            self.range = 2
            num_bits = 7
        else:
            num_bits = 1 if self.range < 256 else 0
        self.low <<= num_bits
        self.range <<= num_bits
        self.bits_left -= num_bits
        if self.bits_left < 12:
            self._write_out()

    def finish(self):
        if self.bit_writer is None:
            return
        if self.low >> (32 - self.bits_left):
            self.bit_writer.write_byte((self.buffered_byte + 1) & 0xFF)
            while self.num_buffered_bytes > 1:
                self.bit_writer.write_byte(0x00)
                self.num_buffered_bytes -= 1
            self.low -= 1 << (32 - self.bits_left)
        else:
            if self.num_buffered_bytes > 0:
                self.bit_writer.write_byte(self.buffered_byte & 0xFF)
            while self.num_buffered_bytes > 1:
                self.bit_writer.write_byte(0xFF)
                self.num_buffered_bytes -= 1
        self.bit_writer.write_bits(self.low >> 8, 24 - self.bits_left)
        self.bit_writer.write_bits(1, 1)
        self.bit_writer.pad_zero_bits()

    def _write_out(self):
        lead_byte = self.low >> (24 - self.bits_left)
        self.bits_left += 8
        self.low &= 0xFFFFFFFF >> self.bits_left
        if lead_byte == 0xFF:
            self.num_buffered_bytes += 1
        else:
            if self.num_buffered_bytes > 0:
                carry = lead_byte >> 8
                byte = self.buffered_byte + carry
                self.buffered_byte = lead_byte & 0xFF
                self.bit_writer.write_byte(byte & 0xFF)
                byte = (0xFF + carry) & 0xFF
                while self.num_buffered_bytes > 1:
                    self.bit_writer.write_byte(byte)
                    self.num_buffered_bytes -= 1
            else:
                self.num_buffered_bytes = 1
                self.buffered_byte = lead_byte
