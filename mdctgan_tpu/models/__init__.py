from mdctgan_tpu.models.generator import GlobalGenerator, LocalEnhancer  # noqa: F401
from mdctgan_tpu.models.discriminator import (  # noqa: F401
    MultiscaleDiscriminator,
    NLayerDiscriminator,
)
from mdctgan_tpu.models.attention import BottleStack  # noqa: F401
