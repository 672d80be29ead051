from mdctgan_tpu.utils.pool import ImagePool  # noqa: F401
from mdctgan_tpu.utils.visualizer import Visualizer  # noqa: F401
