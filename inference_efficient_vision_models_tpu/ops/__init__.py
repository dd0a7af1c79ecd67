from .int8_matmul import int8_matmul_requant
from .im2col import conv_int8_im2col
from .conv3x3 import conv3x3_s1_int8

__all__ = ["int8_matmul_requant", "conv_int8_im2col", "conv3x3_s1_int8"]
