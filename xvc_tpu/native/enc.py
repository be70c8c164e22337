"""Native intra-picture encode driver.

One call to xvcn_encode_picture_intra (xvcn_enc.inc) runs the whole CTU
RDO loop — mode search, transform RD, CABAC bit counting and the final
entropy write — in C++ and returns the CABAC payload bytes.  The Python
CU path remains the validation twin (XVC_NATIVE=0 / XVC_ENC_NATIVE=0);
bitstreams are byte-identical (tests/test_encode_golden.py).
"""
import ctypes as c
import os

import numpy as np

from .. import constants as k
from . import LIB
from .pic import _fam_arrays, _plane_base, _restr_vec, _tx_tables


class XvcnEncSettings(c.Structure):
    _fields_ = [
        ("rdo_quant", c.c_int32),
        ("rdo_quant_2x2", c.c_int32),
        ("structural_ssd", c.c_int32),
        ("structural_strength", c.c_double),
        ("fast_transform_select_eval", c.c_int32),
        ("fast_intra_mode_eval_level", c.c_int32),
        ("fast_cu_split_based_on_full_cu", c.c_int32),
        ("fast_quad_split_based_on_binary_split", c.c_int32),
        ("adaptive_qp", c.c_int32),
        ("aqp_strength", c.c_int32),
        ("eval_prev_mv_search_result", c.c_int32),
        ("fast_merge_eval", c.c_int32),
        ("fast_inter_transform_dist", c.c_int32),
        ("pad_", c.c_int32),
    ]


class XvcnEncPicParams(c.Structure):
    _fields_ = [
        ("ctx_state", c.c_int64),
        ("fam41", c.c_int64),
        ("fam18", c.c_int64),
        ("restr", c.c_int64),
        ("tx_blob", c.c_int64),
        ("tx_offsets", c.c_int64),
        ("orig_plane", c.c_int64 * 3),
        ("orig_stride", c.c_int64 * 3),
        ("rec_plane", c.c_int64 * 3),
        ("rec_stride", c.c_int64 * 3),
        ("out_buf", c.c_int64),
        ("out_cap", c.c_int64),
        ("pic_lambda", c.c_double),
        ("width", c.c_int32),
        ("height", c.c_int32),
        ("bitdepth", c.c_int32),
        ("chroma_fmt", c.c_int32),
        ("pic_qp", c.c_int32),
        ("pred_type", c.c_int32),
        ("max_binary_split_depth", c.c_int32),
        ("chroma_qp_offset_table", c.c_int32),
        ("chroma_qp_offset_u", c.c_int32),
        ("chroma_qp_offset_v", c.c_int32),
        ("deblock", c.c_int32),
        ("beta_offset", c.c_int32),
        ("tc_offset", c.c_int32),
        ("poc", c.c_int32),
        ("num_ctx", c.c_int32),
        ("pad3_", c.c_int32),
        ("settings", XvcnEncSettings),
        ("out_len", c.c_int64),
        ("start_frac_bits", c.c_int64),
        ("status", c.c_int32),
        ("pad2_", c.c_int32),
    ]


def available():
    return (LIB is not None and
            hasattr(LIB, "xvcn_encode_picture_intra") and
            os.environ.get("XVC_ENC_NATIVE", "1") != "0")


def usable_for(pic_data, settings):
    """Native intra encode covers intra pictures without the device
    lookahead (which reorders mode candidates from device cost maps)."""
    if not available() or not pic_data.is_intra_pic():
        return False
    if settings.tpu_intra_lookahead:
        return False
    from ..engine import use_jax_intra_prepass
    if use_jax_intra_prepass():
        return False  # keep the device pre-pass path exercised
    return True


def encode_picture_intra(pic_encoder, segment, settings, base_qp):
    """Returns the CABAC payload bytes for one intra picture; the
    reconstruction is written into pic_encoder.rec_pic in place."""
    pd = pic_encoder.pic_data
    rec = pic_encoder.rec_pic
    orig = pic_encoder.orig_pic
    restr = segment.restrictions
    fam41, fam18 = _fam_arrays()
    tx_blob, tx_offsets = _tx_tables()
    restr_vec = _restr_vec(restr)

    from ..cabac.contexts import NUM_CONTEXTS, CabacContexts
    ctx = CabacContexts(restr)
    ctx.reset_states(base_qp.get_qp_raw(0), pd.get_prediction_type())

    p = XvcnEncPicParams()
    p.ctx_state = ctx.state.ctypes.data
    p.fam41 = fam41.ctypes.data
    p.fam18 = fam18.ctypes.data
    p.restr = restr_vec.ctypes.data
    p.tx_blob = tx_blob.ctypes.data
    p.tx_offsets = tx_offsets.ctypes.data
    for comp in range(3):
        ob, ostride = _plane_base(orig, comp)
        rb, rstride = _plane_base(rec, comp)
        p.orig_plane[comp] = ob
        p.orig_stride[comp] = ostride
        p.rec_plane[comp] = rb
        p.rec_stride[comp] = rstride
    out = np.zeros(max(1 << 16, pd.width * pd.height * 4), dtype=np.uint8)
    p.out_buf = out.ctypes.data
    p.out_cap = out.size
    p.pic_lambda = base_qp.get_lambda()
    p.width = pd.width
    p.height = pd.height
    p.bitdepth = pd.bitdepth
    p.chroma_fmt = int(pd.chroma_format)
    p.pic_qp = base_qp.get_qp_raw(0)
    p.pred_type = int(pd.get_prediction_type())
    p.max_binary_split_depth = segment.max_binary_split_depth
    p.chroma_qp_offset_table = settings.chroma_qp_offset_table
    p.chroma_qp_offset_u = settings.chroma_qp_offset_u
    p.chroma_qp_offset_v = settings.chroma_qp_offset_v
    p.deblock = 1 if pd.deblock else 0
    p.beta_offset = pd.beta_offset
    p.tc_offset = pd.tc_offset
    p.poc = pd.poc
    p.num_ctx = NUM_CONTEXTS
    s = p.settings
    s.rdo_quant = 1 if settings.rdo_quant else 0
    s.rdo_quant_2x2 = settings.rdo_quant_2x2
    s.structural_ssd = settings.structural_ssd
    s.structural_strength = float(settings.structural_strength)
    s.fast_transform_select_eval = settings.fast_transform_select_eval
    s.fast_intra_mode_eval_level = settings.fast_intra_mode_eval_level
    s.fast_cu_split_based_on_full_cu = \
        1 if settings.fast_cu_split_based_on_full_cu else 0
    s.fast_quad_split_based_on_binary_split = \
        settings.fast_quad_split_based_on_binary_split
    s.adaptive_qp = settings.adaptive_qp
    s.aqp_strength = settings.aqp_strength
    s.eval_prev_mv_search_result = settings.eval_prev_mv_search_result
    s.fast_merge_eval = settings.fast_merge_eval
    s.fast_inter_transform_dist = \
        1 if settings.fast_inter_transform_dist else 0

    keep_alive = [ctx.state, fam41, fam18, tx_blob, tx_offsets, restr_vec,
                  out] + [orig.planes[i] for i in range(3)] + \
                 [rec.planes[i] for i in range(3)]
    status = LIB.xvcn_encode_picture_intra(c.byref(p))
    del keep_alive
    if status != 0:
        raise RuntimeError("native intra encode failed (status %d)"
                           % status)
    return out[:p.out_len].tobytes()
