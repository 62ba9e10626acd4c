from tq_tpu.convert.policy import static_conv_layer_settings, EXEMPT_SETTING
from tq_tpu.convert.cnn import convert_cnn, make_cnn_apply, finalize_cnn, pack_cnn

__all__ = [
    "static_conv_layer_settings",
    "EXEMPT_SETTING",
    "convert_cnn",
    "make_cnn_apply",
    "finalize_cnn",
    "pack_cnn",
]
