from streammos_tpu.models.stream_mos import (StreamMOSNet, init_model,
                                             memory_shape, stage_forward,
                                             streaming_loss)

__all__ = [
    "StreamMOSNet",
    "init_model",
    "memory_shape",
    "stage_forward",
    "streaming_loss",
]
