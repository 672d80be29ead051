#!/usr/bin/env python
"""Inference entry point (CLI parity with the reference generate_audio.py).

Thin wrapper over :mod:`mdctgan_tpu.generate_cli`; also installed as the
``mdctgan-generate`` console script."""

from mdctgan_tpu.generate_cli import main

if __name__ == "__main__":
    main()
