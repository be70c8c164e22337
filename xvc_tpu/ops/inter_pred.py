"""Inter prediction: MV derivation + motion compensation.

Behavioral equivalent of the reference inter predictor
(ref: src/xvc_common_lib/inter_prediction.{h,cc}).  Implemented in the
inter phase; the class interface is in place so the decoder wires up.
"""
import numpy as np

from .. import constants as k


class InterPredictor:
    def __init__(self, pic_data, bitdepth, restrictions):
        self.pic = pic_data
        self.bitdepth = bitdepth
        self.restr = restrictions

    def calculate_mv(self, cu):
        from ..codec import inter_mv
        inter_mv.calculate_mv(self, cu)

    def motion_compensation(self, cu, comp):
        from ..codec import inter_mc
        return inter_mc.motion_compensation(self, cu, comp)
