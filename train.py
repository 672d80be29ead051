#!/usr/bin/env python
"""Training entry point (CLI parity with the reference train.py).

Thin wrapper over :mod:`mdctgan_tpu.train_cli`; also installed as the
``mdctgan-train`` console script."""

from mdctgan_tpu.train_cli import main

if __name__ == "__main__":
    main()
