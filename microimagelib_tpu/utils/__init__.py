from microimagelib_tpu.utils.device import query_device

__all__ = ["query_device"]
