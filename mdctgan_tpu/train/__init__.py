from mdctgan_tpu.train.state import GANTrainState, create_train_state  # noqa: F401
from mdctgan_tpu.train.step import build_train_step, build_inference_fn  # noqa: F401
