from mdctgan_tpu.data.dataset import (  # noqa: F401
    AudioDataset,
    AudioTestDataset,
    list_audio_files,
)
from mdctgan_tpu.data.pipeline import InputPipeline  # noqa: F401
