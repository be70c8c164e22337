"""Inter mode RD search (merge / ME / affine / LIC / fullpel).

Behavioral equivalent of the reference inter search
(ref: src/xvc_enc_lib/inter_search.cc, cu_encoder.cc:431-515).
Implemented incrementally; see inter_me.py for the motion estimation.
"""


def compress_inter_pic(enc, best_cu_holder, qp, rdo_depth, cache_result,
                       writer):
    from . import inter_me
    return inter_me.compress_inter_pic(enc, best_cu_holder, qp, rdo_depth,
                                       cache_result, writer)
