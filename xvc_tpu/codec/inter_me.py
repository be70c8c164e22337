"""Inter motion estimation + mode RD search (encoder side).

Behavioral equivalent of the reference inter search
(ref: src/xvc_enc_lib/inter_search.cc, inter_tz_search.cc,
 cu_encoder.cc:431-515).  Implemented in the inter-encoder phase.
"""


class InterSearch:
    def __init__(self, cu_encoder):
        self.enc = cu_encoder


def compress_inter_pic(enc, best_cu_holder, qp, rdo_depth, cache_result,
                       writer):
    raise NotImplementedError("inter encoding lands with the inter phase")
