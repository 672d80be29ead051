"""Host->device input pipeline with on-device degradation.

The reference decodes AND resamples on the host in DataLoader workers
(data/audio_dataset.py:66-78, custom_dataset_data_loader.py:38-51).  Here the
host path is decode-only (native C++ prefetcher when available, Python
fallback otherwise); the degradation — orig->hr resample, orig->lr->hr
down-up simulation, SNR noise — is a single jitted on-device function, and a
background thread keeps a bounded queue of device-resident batches so the
train step never waits on input (double buffering).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mdctgan_tpu.data import native
from mdctgan_tpu.data.dataset import AudioDataset
from mdctgan_tpu.ops.features import SpectralConfig
from mdctgan_tpu.ops.resample import add_noise_snr, degrade_lr, fix_length, resample


def make_degrade_fn(cfg: SpectralConfig, orig_freq: int, add_noise: bool, snr: float):
    """Jitted (segments at orig rate, rng) -> {'lr_audio','hr_audio'} at HR
    rate, both fixed to segment_length (audio_dataset.py:66-82)."""

    @jax.jit
    def degrade(wave: jax.Array, rng: jax.Array) -> Dict[str, jax.Array]:
        hr = resample(wave, orig_freq, cfg.hr_sampling_rate)
        lr = degrade_lr(wave, orig_freq, cfg.lr_sampling_rate, cfg.hr_sampling_rate)
        if add_noise:
            lr = add_noise_snr(lr, rng, snr, cfg.segment_length)
        return {
            "hr_audio": fix_length(hr, cfg.segment_length),
            "lr_audio": fix_length(lr, cfg.segment_length),
        }

    return degrade


class InputPipeline:
    """Background-threaded batch producer.

    Decoding happens in C++ worker threads (no GIL) when the native library
    is built; the Python thread only assembles batches, ships them to the
    device (optionally sharded over a mesh) and runs the jitted degradation.
    """

    def __init__(
        self,
        dataset: AudioDataset,
        cfg: SpectralConfig,
        batch_size: int,
        orig_freq: Optional[int] = None,
        add_noise: bool = False,
        snr: float = 55.0,
        seed: int = 42,
        queue_size: int = 4,
        sharding=None,
        n_threads: int = 4,
    ):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.sharding = sharding
        if orig_freq is None:
            # probe past undecodable leading files (the data layer's
            # skip-on-decode-failure contract, dataset.py sample()) instead
            # of aborting training on a corrupt first CSV entry
            for j in range(len(dataset)):
                try:
                    orig_freq, _ = dataset._probe(j)
                    break
                except Exception:
                    continue
            if orig_freq is None:
                from mdctgan_tpu.data.dataset import unsupported_note
                raise RuntimeError(
                    f"no decodable audio files in dataset ({len(dataset)} "
                    "entries, all failed to probe)"
                    + unsupported_note(dataset.files))
        self.orig_freq = orig_freq
        self._add_noise, self._snr = add_noise, snr
        # one jitted degrade program per observed sample rate (the reference
        # resamples each item at its own rate, audio_dataset.py:64-71);
        # pre-warm with the probed rate
        self._degrade_cache: Dict[int, object] = {}
        self._degrade_for(orig_freq)
        self._rng = jax.random.PRNGKey(seed)
        self._queue: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._prefetcher = None
        # the C++ prefetcher samples randomly; serial mode stays in Python
        if not getattr(dataset, "serial", False) and native.load_library() is not None:
            try:
                self._prefetcher = native.NativePrefetcher(
                    dataset.files, dataset.segment_length,
                    n_threads=n_threads, queue_cap=queue_size * batch_size,
                    seed=seed,
                )
            except Exception:
                self._prefetcher = None
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _degrade_for(self, sr: int):
        fn = self._degrade_cache.get(int(sr))
        if fn is None:
            fn = make_degrade_fn(self.cfg, int(sr), self._add_noise, self._snr)
            self._degrade_cache[int(sr)] = fn
        return fn

    def _host_batch(self) -> "tuple[np.ndarray, np.ndarray]":
        """(segments, per-item sample rates).  Segment buffers are a fixed
        ``segment_length`` frames at each file's NATIVE rate (mirroring the
        reference's ``num_frames=segment_length`` crop,
        audio_dataset.py:44-52), so mixed-rate batches still stack."""
        if self._prefetcher is not None:
            segs, rates = [], []
            for _ in range(self.batch_size):
                seg, sr = self._prefetcher.next()
                segs.append(seg)
                rates.append(sr)
            return np.stack(segs), np.asarray(rates, np.int64)
        batch, rates = self.dataset.sample_batch_rates(self.batch_size)
        return batch, rates

    def _degrade_batch(self, wave, rates: np.ndarray, rng) -> Dict[str, jax.Array]:
        """Degrade with each item's own resample ratio.  Homogeneous batches
        (the common case — VCTK is single-rate) run ONE program; a mixed
        batch runs one full-batch program per distinct rate (uniform shapes,
        so at most one compile per rate ever) and selects rows on device."""
        uniq = np.unique(rates)
        if jax.process_count() > 1 and (
            len(uniq) > 1 or int(uniq[0]) != self.orig_freq
        ):
            # under --multihost every process must issue the SAME program
            # sequence on the global mesh; per-process rate draws diverge
            # (and the row-select mask below is local-shaped while `wave`
            # is global).  Resample such corpora offline first.
            raise ValueError(
                f"mixed/non-probed sample rates {sorted(uniq.tolist())} are "
                f"unsupported under multi-process training (pipeline probed "
                f"{self.orig_freq} Hz); single-process runs handle them"
            )
        if len(uniq) == 1:
            return self._degrade_for(int(uniq[0]))(wave, rng)
        out: Optional[Dict[str, jax.Array]] = None
        for r in uniq:
            d = self._degrade_for(int(r))(wave, rng)
            if out is None:
                out = d
            else:
                mask = jnp.asarray((rates == r).reshape(-1, 1))
                out = {k: jnp.where(mask, d[k], out[k]) for k in d}
        return out

    def _work(self) -> None:
        while not self._stop.is_set():
            try:
                host, rates = self._host_batch()
                if self.sharding is not None:
                    from mdctgan_tpu.parallel.mesh import put_global_batch

                    wave = put_global_batch(host, self.sharding)
                else:
                    wave = jnp.asarray(host)
                self._rng, sub = jax.random.split(self._rng)
                batch = self._degrade_batch(wave, rates, sub)
            except StopIteration:
                break
            except BaseException as e:  # surface in __next__, don't die silently
                self._error = e
                break
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        return self

    def __next__(self) -> Dict[str, jax.Array]:
        while True:
            if self._queue.empty() and self._error is not None:
                raise RuntimeError("input pipeline worker failed") from self._error
            if self._stop.is_set() and self._queue.empty():
                raise StopIteration
            try:
                return self._queue.get(timeout=1.0)
            except queue.Empty:
                if not self._thread.is_alive():
                    if self._error is not None:
                        raise RuntimeError(
                            "input pipeline worker failed"
                        ) from self._error
                    raise StopIteration

    def close(self) -> None:
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)
        # Only tear down the native prefetcher once the worker thread is
        # gone: destroying it while the thread is blocked inside
        # audioio_prefetcher_next would free the C++ object under a live
        # call (use-after-free).  On a stuck shutdown, poison the handle
        # (leak) so the prefetcher's later __del__ cannot destroy it under
        # the still-blocked thread either.
        if self._prefetcher is not None:
            if self._thread.is_alive():
                self._prefetcher.leak()
            else:
                self._prefetcher.close()
