from m4depth_tpu.train.step import (
    Batch,
    batch_camera,
    create_train_state,
    make_train_step,
    make_windowed_eval_step,
    make_streaming_eval_step,
    jit_data_parallel,
)

__all__ = [
    "Batch",
    "batch_camera",
    "create_train_state",
    "make_train_step",
    "make_windowed_eval_step",
    "make_streaming_eval_step",
    "jit_data_parallel",
]
