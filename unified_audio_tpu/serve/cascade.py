"""SS cascade served through the continuous-batching engine.

The offline SS flow (models/unise/model.py separate_ss, rebuilding the
reference's ``model/model.py:229-290``) chains three generates: SE on the
first 5-s segment builds an enrollment waveform, then TSE extracts speaker
s1 and rTSE extracts s2 over every segment. Offline, the intermediate
enhanced audio round-trips through the host between phases (detokenize ->
numpy -> normalize -> featurize).

Served, that round trip is the expensive part: on a tunnel-attached chip a
5-s waveform fetch plus a feature re-upload costs ~0.8 MB of serialized
link time per cascade. :class:`SSCascadeRunner` keeps the bridge ON
DEVICE — only the SE phase's token IDs (~1 KB) touch the host:

  phase 1   SE requests (first segments) run through the engine alongside
            any regular traffic.
  bridge    per cascade, the SE tokens re-enter the device (tiny transfer)
            and TWO programs — the BiCodec detokenizer the offline path
            itself uses, then a fused peak-normalize + WavLM featurize +
            bucket-pad program — produce the enrollment feature rows, which
            are staged directly into the engine via ``stage_request``
            (Request.enroll_device_frames). The enhanced waveform and its
            features never cross the link.
  phase 2   TSE + rTSE requests for every segment run through the engine,
            all referencing row 0 of their cascade's on-device enrollment
            buffer; both tasks share one staged mix-segment buffer.

The two bridge programs mirror the offline pair (detokenize program, WavLM
feature program) rather than fusing into one, so greedy cascade output is
token-for-token the offline cascade's (tests/test_cascade.py pins it);
fusing them is a latency knob the parity pin would have to re-verify.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .engine import (ContinuousBatchingEngine, Request, Result, _next_pow2)

# uid namespaces for the engine-level requests a cascade expands into
_SE, _TSE, _RTSE = 0, 1, 2


@dataclass
class SSRequest:
    """One separation-cascade request: ``wav`` (1, T) at the model rate.

    ``first_feats`` / ``seg_feats`` are the SE-phase and segment features,
    precomputed exactly as the offline flow computes them (peak-normalized
    per the reference's recipe) — build with :meth:`SSCascadeRunner.make`.
    """
    uid: int
    first_feats: np.ndarray  # (F, D) SE-phase features of the first segment
    seg_feats: np.ndarray  # (N, F, D) per-segment mix features
    orig_len: int  # true sample length, for reassembly
    temperature: float = 0.8
    top_k: int = 50
    top_p: float = 0.95
    do_sample: bool = True


@dataclass
class SSResult:
    uid: int
    s1: List[Result] = field(default_factory=list)  # per segment, in order
    s2: List[Result] = field(default_factory=list)


class SSCascadeRunner:
    """Drives SS cascades through a :class:`ContinuousBatchingEngine`.

    ``unise`` supplies the frozen bridge models (BiCodec detokenizer +
    WavLM frontend) and the segmentation geometry; the engine supplies
    slots. Regular SE/TSE traffic can ride the same pool: pass it as
    ``extra`` to :meth:`run` and it is admitted with the phase-1 wave.
    """

    def __init__(self, engine: ContinuousBatchingEngine, unise):
        if engine.feats_wire != "bf16":
            raise ValueError(
                "SSCascadeRunner stages device-resident enrollment rows, "
                "which requires feats_wire='bf16' (engine-dtype rows)")
        self.eng = engine
        self.unise = unise
        cfg = unise.config
        self.seg_len = cfg.segment_len
        self.frames = unise._semantic_len()
        self.enr_bucket = self._pick_bucket(self.frames,
                                            engine.enroll_buckets)
        self.mix_bucket = self._pick_bucket(self.frames, engine.mix_buckets)
        kv_dtype = engine.kv_dtype
        seg_len = self.seg_len
        enr_bucket = self.enr_bucket
        wavlm_feats_pure = unise.wavlm_feats_pure

        @jax.jit
        def _enroll_rows(wavlm_vars, est_wav):
            """SE output -> staged enrollment rows, entirely on device.

            Reproduces the offline bridge bit-for-bit in fp32: flatten and
            slice to one segment, peak-normalize to 0.99 (separate_ss), run
            the SAME WavLM feature program the offline path uses, then
            zero-pad to the admission bucket and cast to the engine dtype
            (exactly what host staging does to offline-computed features).
            """
            w = est_wav.reshape(-1)[:seg_len][None, :]
            w = w / (jnp.max(jnp.abs(w)) + 1e-5) * 0.99
            feats = wavlm_feats_pure(wavlm_vars, w)  # (1, F, D)
            pad = enr_bucket - feats.shape[1]
            feats = jnp.pad(feats, [(0, 0), (0, pad), (0, 0)])
            return feats.astype(kv_dtype)

        self._enroll_rows = _enroll_rows

    @staticmethod
    def _pick_bucket(n: int, buckets: Sequence[int]) -> int:
        fit = [b for b in buckets if b >= n]
        if not fit:
            raise ValueError(
                f"no admission bucket fits {n} frames (buckets={buckets})")
        return min(fit)

    # --- request construction (mirrors the offline normalization) ---

    def make(self, wav: np.ndarray, uid: int, **sampling) -> SSRequest:
        """Build an :class:`SSRequest` from raw audio (1, T).

        Features are computed with the same programs and the same
        normalizers as ``separate_ss``: the SE phase sees the FIRST segment
        normalized by its own peak (enhance_se on the wrapped first
        segment), phase 2 sees every segment normalized by the whole
        utterance's peak (enhance_tse)."""
        u = self.unise
        wav = np.asarray(wav, np.float32)
        seg = self.seg_len
        first = wav[:, :seg]
        if first.shape[-1] < seg:
            first = np.pad(first, [(0, 0), (0, seg - first.shape[-1])],
                           mode="wrap")
        fseg, _ = u._segment(first)
        fpeak = jnp.max(jnp.abs(jnp.asarray(first)), axis=-1, keepdims=True)
        first_feats = np.asarray(
            u.extract_semantic_features(fseg / fpeak)[0])
        segs, t = u._segment(wav)
        peak = jnp.max(jnp.abs(jnp.asarray(wav)), axis=-1, keepdims=True)
        seg_feats = np.asarray(u.extract_semantic_features(segs / peak))
        return SSRequest(uid=uid, first_feats=first_feats,
                         seg_feats=seg_feats, orig_len=t, **sampling)

    # --- engine-request expansion ---

    def _sub_uid(self, uid: int, phase: int, seg: int) -> int:
        return (uid * 4 + phase) * 65536 + seg

    def _se_request(self, r: SSRequest) -> Request:
        return Request(
            task_id=0, mix_feats=r.first_feats,
            global_length=self.unise.config.global_tokens,
            semantic_length=self.frames,
            temperature=r.temperature, top_k=r.top_k, top_p=r.top_p,
            do_sample=r.do_sample, uid=self._sub_uid(r.uid, _SE, 0))

    def run(self, requests: List[SSRequest], rng,
            extra: Optional[List[Request]] = None,
            poll_interval: int = 256,
            ) -> Tuple[Dict[int, SSResult], Dict[int, Result]]:
        """Run cascades (+ optional regular traffic) to completion.

        Returns ``(cascade_results, extra_results)``. Phase 1 admits every
        cascade's SE request together with ``extra``; the bridge stages
        each cascade's enrollment on device; phase 2 runs all TSE/rTSE
        segment requests. A continuous deployment would rotate incoming
        cascades through these phases per wave — the bridge itself is
        already incremental (one cascade at a time)."""
        eng, task_map = self.eng, {"tse": 1, "rtse": 2}
        phase1 = [self._se_request(r) for r in requests] + list(extra or [])
        out1 = eng.run(phase1, rng, poll_interval=poll_interval)

        wavlm_vars = self.unise.wavlm_variables
        tok = self.unise.tokenizer
        phase2: List[Request] = []
        for r in requests:
            se = out1[self._sub_uid(r.uid, _SE, 0)]
            # tokens re-enter the device (~1 KB); the waveform/features of
            # the enhanced audio never leave it
            est = tok.detokenize(np.asarray(se.global_ids)[None, None, :],
                                 np.asarray(se.semantic_ids)[None, :])
            enr_buf = self._enroll_rows(wavlm_vars, est)
            n = r.seg_feats.shape[0]
            mix = np.zeros((_next_pow2(n), self.mix_bucket,
                            r.seg_feats.shape[2]), np.dtype(eng.kv_dtype))
            mix[:n, : r.seg_feats.shape[1]] = r.seg_feats
            mix_dev = jnp.asarray(mix)
            for phase, task in ((_TSE, "tse"), (_RTSE, "rtse")):
                for i in range(n):
                    req = Request(
                        task_id=task_map[task],
                        mix_device_frames=r.seg_feats.shape[1],
                        enroll_device_frames=self.frames,
                        global_length=self.unise.config.global_tokens,
                        semantic_length=self.frames,
                        temperature=r.temperature, top_k=r.top_k,
                        top_p=r.top_p, do_sample=r.do_sample,
                        uid=self._sub_uid(r.uid, phase, i))
                    eng.stage_request(req, mix_ref=(mix_dev, i),
                                      enroll_ref=(enr_buf, 0))
                    phase2.append(req)
        out2 = eng.run(phase2, rng, poll_interval=poll_interval)

        results: Dict[int, SSResult] = {}
        for r in requests:
            n = r.seg_feats.shape[0]
            res = SSResult(uid=r.uid)
            for phase, dest in ((_TSE, res.s1), (_RTSE, res.s2)):
                dest.extend(out2[self._sub_uid(r.uid, phase, i)]
                            for i in range(n))
            results[r.uid] = res
        extra_results = {u: v for u, v in out1.items()
                         if not any(u == self._sub_uid(r.uid, _SE, 0)
                                    for r in requests)}
        return results, extra_results

    def assemble(self, r: SSRequest, res: SSResult
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """Token results -> (s1, s2) waveforms, via the same detokenize
        call the offline cascade ends with."""
        u = self.unise
        out = []
        for parts in (res.s1, res.s2):
            g = np.stack([p.global_ids for p in parts])
            s = np.stack([p.semantic_ids for p in parts])
            out.append(u._decode_tokens(jnp.asarray(g), jnp.asarray(s),
                                        r.orig_len))
        return out[0], out[1]
