from mdctgan_tpu.ops.window import kbd_window, kaiser_window  # noqa: F401
from mdctgan_tpu.ops.mdct import MDCT, IMDCT, mdct, imdct, mdct_matrix  # noqa: F401
