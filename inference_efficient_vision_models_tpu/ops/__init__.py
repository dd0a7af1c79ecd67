from .int8_matmul import int8_matmul_requant
from .im2col import conv_int8_im2col

__all__ = ["int8_matmul_requant", "conv_int8_im2col"]
