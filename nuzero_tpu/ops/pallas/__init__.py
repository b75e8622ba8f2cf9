from nuzero_tpu.ops.pallas.hexconv_kernel import hex_conv_pallas

__all__ = ["hex_conv_pallas"]
