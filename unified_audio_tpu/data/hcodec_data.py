"""Domain-weighted codec training data (HCodec-1.0 dataloader/data_module.py):
sample speech / music / audio domains by configured weights
(process_one_sample:140-158), fixed-length crops, threaded prefetch, and a
round-robin-over-domains validation iterator (ValDataLoadIter:207+)."""
from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional, Sequence

import numpy as np

from .audio_io import read_wav
from .data_module import load_scp, pad_or_cut


class DomainWeightedIterator:
    """Yields (wav (B, T), domains list[str]) batches."""

    def __init__(
        self,
        domain_scps: Dict[str, Sequence[str]],  # e.g. {"speech": [...], ...}
        domain_weights: Optional[Dict[str, float]] = None,
        batch_size: int = 8,
        cut_seconds: float = 3.0,
        sample_rate: int = 16000,
        num_workers: int = 4,
        prefetch: int = 2,
        samples_per_epoch: int = 10000,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.lists = {
            d: load_scp(scps, "speech") for d, scps in domain_scps.items()
        }
        for d, lst in self.lists.items():
            assert lst, f"empty domain {d}"
        weights = domain_weights or {d: 1.0 for d in self.lists}
        total = sum(weights.values())
        self.domains = list(self.lists)
        self.probs = [weights[d] / total for d in self.domains]
        self.batch_size = batch_size
        self.crop = int(cut_seconds * sample_rate)
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.samples_per_epoch = samples_per_epoch
        self.rank, self.world = process_index, process_count
        self.rng = random.Random(seed + 1000 * process_index)

    def __len__(self):
        return self.samples_per_epoch // (self.world * self.batch_size)

    def _one(self, domain: str):
        rng = self.rng
        for _ in range(3):
            try:
                info = rng.choice(self.lists[domain])
                wav, fs = read_wav(info.path)
                wav = wav[:1]
                wav, _ = pad_or_cut(wav, self.crop, None, rng)
                return wav
            except Exception:
                continue
        raise RuntimeError(f"failed to load from domain {domain}")

    def _producer(self, q, done):
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for _ in range(len(self)):
                domain = self.rng.choices(self.domains, weights=self.probs)[0]
                wavs = list(pool.map(self._one, [domain] * self.batch_size))
                q.put((np.concatenate(wavs, 0).astype(np.float32), domain))
        done.set()

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch + 1)
        done = threading.Event()
        threading.Thread(target=self._producer, args=(q, done),
                         daemon=True).start()
        while not done.is_set() or not q.empty():
            try:
                yield q.get(timeout=1.0)
            except queue.Empty:
                continue


class RoundRobinValIterator:
    """Validation: cycle domains in order so every domain is covered evenly."""

    def __init__(self, domain_scps: Dict[str, Sequence[str]],
                 cut_seconds: float = 3.0, sample_rate: int = 16000,
                 limit_per_domain: int = 8):
        self.lists = {d: load_scp(s, "speech") for d, s in domain_scps.items()}
        self.crop = int(cut_seconds * sample_rate)
        self.limit = limit_per_domain

    def __iter__(self):
        rng = random.Random(0)
        for i in range(self.limit):
            for d, lst in self.lists.items():
                info = lst[i % len(lst)]
                wav, fs = read_wav(info.path)
                wav, _ = pad_or_cut(wav[:1], self.crop, 0, rng)
                yield wav.astype(np.float32), d
