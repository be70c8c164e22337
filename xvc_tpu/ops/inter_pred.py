"""Inter prediction facade: MV derivation + motion compensation.

Behavioral equivalent of the reference inter predictor
(ref: src/xvc_common_lib/inter_prediction.{h,cc}).  The heavy lifting
lives in xvc_tpu.codec.inter_mv (MV derivation) and
xvc_tpu.codec.inter_mc (interpolation filters).
"""


class InterPredictor:
    def __init__(self, pic_data, rec_pic, bitdepth, restrictions):
        self.pic = pic_data
        self.rec_pic = rec_pic
        self.bitdepth = bitdepth
        self.restr = restrictions

    def calculate_mv(self, cu):
        from ..codec import inter_mv
        inter_mv.calculate_mv(self, cu)

    def motion_compensation(self, cu, comp):
        from ..codec import inter_mc
        return inter_mc.motion_compensation(self, cu, comp)
