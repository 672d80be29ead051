#!/usr/bin/env bash
# Recursive wav -> flac dataset compression (reference: data/compress_audio.sh,
# an ffmpeg batch loop) using the built-in pure-Python FLAC encoder.
python -m mdctgan_tpu.data.flacenc "${1:-.}"
