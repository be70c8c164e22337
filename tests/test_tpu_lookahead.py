"""TPU whole-frame intra lookahead (RD-equivalent fast mode).

EncoderSettings.tpu_intra_lookahead replaces the per-CU closed-loop
SATD mode pre-pass with device cost maps computed once per picture
(xvc_tpu/tpu/lookahead.py) — the first stage of the bottom-up batched
RDO redesign (SURVEY.md §7(e)).  The bitstream is different from the
reference ordering but must stay conforming with near-identical
rate/distortion; pinned here.
"""
import numpy as np
import pytest

from xvc_tpu.api import EncoderParameters, EncoderSession
from xvc_tpu.codec.decoder import decode_stream


def _content(w, h):
    rng = np.random.RandomState(5)
    yy, xx = np.mgrid[0:h, 0:w]
    tex = rng.randint(-20, 21, (h, w))
    y = np.clip(110 + 70 * np.sin(xx / 9.0) * np.cos(yy / 7.0) + tex,
                0, 255).astype(np.uint8)
    return (y.tobytes() +
            np.full((h // 2, w // 2), 110, np.uint8).tobytes() +
            np.full((h // 2, w // 2), 140, np.uint8).tobytes())


def _encode(raw, w, h, explicit=None):
    p = EncoderParameters(width=w, height=h, qp=32, speed_mode=2,
                          num_ref_pics=0, sub_gop_length=1,
                          checksum_mode=1)
    if explicit:
        p.explicit_encoder_settings = explicit
    s = EncoderSession(p)
    nals = s.encode(raw) + s.flush()
    stream = b"".join(len(n).to_bytes(4, "little") + n for n in nals)
    return stream, s.total_sse


def test_lookahead_mode_conforming_and_rd_equivalent():
    w, h = 96, 80
    raw = _content(w, h)
    base, sse_base = _encode(raw, w, h)
    look, sse_look = _encode(raw, w, h, "tpu_intra_lookahead 1")
    # conforming stream, decodable by our decoder with checksum pass
    pics = decode_stream(look)
    assert all(p.conforming for p in pics)
    # rate/distortion parity: within 2% bits and 0.1 dB-equivalent SSE
    assert len(look) <= len(base) * 1.02 + 16
    assert sse_look <= sse_base * 1.03 + 64
