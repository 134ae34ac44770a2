"""HCodec-1.5: adaptive frame rate via similarity segmentation + query-token
aggregation (HCodec-1.5 vq/codec_adaptive.py:28-209,
adaptive/model_blocks/modeling_flexicodec_new.py:828-1050).

Dynamic shapes redesigned for XLA (SURVEY §7 "hard parts"):

* Segmentation: greedy lax.scan over time — a new group starts when the cosine
  similarity of consecutive semantic frames drops below the threshold or the
  group reaches ``max_group_len`` (8). Output is a dense ``group_ids (B, T)``
  map; the number of groups is data-dependent but everything is computed at
  the fixed maximum G = T with padding groups masked.
* Aggregation: the reference interleaves learned query tokens into the frame
  stream and runs a Mimi transformer (mimi/transformer.py:701-826). The same
  architecture is kept weight-for-weight (nn/mimi.py) but the interleaved
  buffer is a STATIC T+G scatter with invalid tail positions masked out of
  attention — reference-golden tested (tests/test_reference_golden.py).
* De-aggregation: instead of per-item repeat_interleave, a gather
  ``out[b, t] = groups[b, group_ids[b, t]]``.
* Token-length injection (codec_adaptive.py:68-80): the duration of each group
  rides in the code index, ``code' = (len-1) * codebook_size + code``.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...nn.blocks import SEANetEncoder
from ...nn.mimi import MimiProjectedTransformer, MimiTransformer
from ...ops.quant import ResidualVQ
from .codec import CodecDecoder10, HCodecConfig, hcodec10_config
from .semantic import SemanticDecoder, SemanticEncoder


def similarity_group_ids(
    emb: jnp.ndarray, threshold: float, max_group_len: int = 8
) -> jnp.ndarray:
    """Greedy similarity segmentation -> group ids (B, T) int32, monotone
    starting at 0 (modeling_flexicodec_new.py:828-925 semantics)."""
    norm = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
    sim = jnp.sum(norm[:, 1:] * norm[:, :-1], axis=-1)  # (B, T-1)
    # boundary rule matches the reference exactly: sim <= threshold starts a
    # new group (modeling_flexicodec_new.py:880). threshold may be a traced
    # scalar (dynamic / manual modes).
    new_by_sim = sim <= threshold
    # scan to enforce the max group length
    def step(carry, new_flag):
        run_len = carry
        force = run_len >= max_group_len
        boundary = new_flag | force
        run_len = jnp.where(boundary, 1, run_len + 1)
        return run_len, boundary

    b, t, _ = emb.shape
    init = jnp.ones((b,), jnp.int32)
    _, boundaries = jax.lax.scan(step, init, jnp.swapaxes(new_by_sim, 0, 1))
    boundaries = jnp.swapaxes(boundaries, 0, 1)  # (B, T-1)
    first = jnp.zeros((b, 1), boundaries.dtype)
    return jnp.cumsum(
        jnp.concatenate([first, boundaries], axis=1).astype(jnp.int32), axis=1
    )


def group_lengths(group_ids: jnp.ndarray, max_groups: int) -> jnp.ndarray:
    """(B, T) -> (B, G) frame counts per group (0 for padding groups)."""
    onehot = jax.nn.one_hot(group_ids, max_groups, dtype=jnp.int32)
    return jnp.sum(onehot, axis=1)


def degroup(groups: jnp.ndarray, group_ids: jnp.ndarray) -> jnp.ndarray:
    """Gather groups (B, G, D) back to frames (B, T, D) by group id."""
    return jnp.take_along_axis(
        groups, group_ids[..., None].astype(jnp.int32), axis=1
    )


def group_ids_from_lengths(lengths: jnp.ndarray, t: int) -> jnp.ndarray:
    """Inverse of group_lengths: (B, G) -> (B, T) (cumsum + searchsorted)."""
    ends = jnp.cumsum(lengths, axis=-1)  # (B, G)
    pos = jnp.arange(t)
    return jax.vmap(lambda e: jnp.searchsorted(e, pos, side="right"))(ends).astype(
        jnp.int32
    )


def inject_length(codes: jnp.ndarray, lengths: jnp.ndarray,
                  codebook_size: int) -> jnp.ndarray:
    """code' = (len-1)*codebook_size + code; padding groups (len 0) -> -1."""
    valid = lengths > 0
    out = (jnp.maximum(lengths, 1) - 1)[..., None] * codebook_size + codes
    return jnp.where(valid[..., None], out, -1)


def extract_length(codes: jnp.ndarray, codebook_size: int):
    """-> (plain codes, lengths); -1 stays -1 / length 0."""
    valid = codes >= 0
    lengths = jnp.where(valid, codes // codebook_size + 1, 0)
    plain = jnp.where(valid, codes % codebook_size, -1)
    # all layers share the group's length: take layer 0
    return plain, lengths[..., 0]


class QueryTokenAggregator(nn.Module):
    """Reference-weight-compatible aggregator
    (mimi/transformer.py:701-826 QueryTokenAggregator).

    The reference interleaves one query token after each group's last frame
    and runs the whole (T + nG)-long sequence through a Mimi transformer
    (causal=False -> FULL attention), then gathers the outputs at the query
    positions. Queries are initialized from group means plus a learned
    ``query_embedding`` (use_mean_pooling_init=True, query=True — the
    shipped config).

    Static-shape redesign: the interleaved buffer is fixed at T + G
    (G = T max groups); valid tokens occupy positions [0, T + nG) exactly as
    in the unpadded reference, and the tail padding is EXCLUDED from
    attention via ``key_valid`` (the reference instead lets its batch
    padding attend — "Assumes transformer handles zero-padding",
    transformer.py:815 — so for padded multi-item batches the reference's
    own outputs are contaminated by pad queries; masking is the correct
    semantics and coincides exactly at batch 1 / equal lengths, which is
    what the reference-goldens pin)."""

    dim: int
    num_heads: int = 8
    num_layers: int = 2
    dim_feedforward: int = 2048
    context: int = 16  # causal-mask knob only; causal=False here

    @nn.compact
    def __call__(self, frames, group_ids):
        b, t, d = frames.shape
        g = t  # static max groups
        onehot = jax.nn.one_hot(group_ids, g, dtype=frames.dtype)  # (B, T, G)
        counts = jnp.sum(onehot, axis=1)  # (B, G)
        valid_g = counts > 0
        ng = jnp.sum(valid_g.astype(jnp.int32), axis=1)  # (B,)
        means = jnp.einsum("btg,btd->bgd", onehot, frames) / jnp.maximum(
            counts[..., None], 1.0
        )
        # reference stores (1, in_out_dim, 1); ours is the (D,) vector
        query_emb = self.param(
            "query_embedding", nn.initializers.normal(1.0), (d,))
        queries = means + query_emb

        # interleave destinations (transformer.py:772-782):
        #   frame t -> t + (#groups ended before t) = t + group_id[t]
        #   query g -> last_frame(g) + g + 1 = cumsum(counts)[g] + g
        s2 = t + g
        frame_dest = jnp.arange(t)[None] + group_ids  # (B, T)
        cum = jnp.cumsum(counts.astype(jnp.int32), axis=1)  # (B, G)
        query_dest = jnp.where(
            valid_g, cum + jnp.arange(g)[None] - 1 + 1, s2 - 1)
        seq = jnp.zeros((b, s2, d), frames.dtype)
        bidx = jnp.arange(b)[:, None]
        seq = seq.at[bidx, frame_dest].set(frames)
        # padding queries land on slot s2-1 harmlessly (masked from
        # attention and never gathered)
        seq = seq.at[bidx, query_dest].set(
            jnp.where(valid_g[..., None], queries, 0.0))

        key_valid = jnp.arange(s2)[None] < (t + ng)[:, None]  # (B, S2)
        out = MimiTransformer(
            d_model=d, num_layers=self.num_layers, num_heads=self.num_heads,
            dim_feedforward=self.dim_feedforward, causal=False,
            context=self.context, layer_scale=0.01, name="transformer",
        )(seq, key_valid)

        gathered = jnp.take_along_axis(
            out, jnp.minimum(query_dest, s2 - 1)[..., None], axis=1)
        gathered = gathered * valid_g[..., None]
        return gathered, counts.astype(jnp.int32)


@dataclass(frozen=True)
class AdaptiveConfig:
    base: HCodecConfig = hcodec10_config()
    # threshold modes (modeling_flexicodec_new.py:351-367):
    #   fixed   -> similarity_threshold
    #   dynamic -> uniform(threshold_lower, threshold_upper) per call, drawn
    #              from the "threshold" rng stream
    # a manual per-call override is the ``threshold=`` argument on
    # __call__/encode/token_rate (reference: manual_threshold)
    threshold_mode: str = "fixed"
    similarity_threshold: float = 0.9
    threshold_lower: float = 0.8
    threshold_upper: float = 1.0
    max_group_len: int = 8
    # aggregators (config_adaptive_v3.yaml:76-93): 32-layer Mimi stacks,
    # d 512 == in_out_dim, ff 2048, context 16, mean-pooling query init
    aggregator_layers: int = 32
    aggregator_heads: int = 8
    aggregator_ff: int = 2048
    aggregator_context: int = 16
    # decode bottleneck: reference wires a 32-layer ProjectedTransformer
    # (d_model 1024, ff 2048, heads 8, context 16 frames,
    # config_adaptive_v3.yaml:96-111 + mimi/transformer.py:828) between the
    # de-aggregated streams and the decoder
    bottleneck_layers: int = 32
    bottleneck_dim: int = 0  # 0 -> latent_dim * 2 (the reference's d_model)
    bottleneck_heads: int = 8
    bottleneck_ff: int = 2048
    bottleneck_context: int = 16


def adaptive15_config(**kw) -> AdaptiveConfig:
    """The shipped HCodec-1.5 adaptive model (conf/config_adaptive_v3.yaml):
    XLSR 1024-d features, 1024-d decoder (intermediate 2304), 32-layer
    aggregators + bottleneck, fixed threshold 0.7."""
    base = dict(
        base=hcodec10_config(
            version="1.5", feat_dim=1024, semantic_encode_channels=1024,
            decoder_dim=1024, decoder_intermediate_dim=2304,
            seanet_ratios=(2, 4, 5, 8),
        ),
        similarity_threshold=0.7,
        threshold_lower=0.7,
        threshold_upper=1.0,
        max_group_len=8,
    )
    base.update(kw)
    return AdaptiveConfig(**base)


class AdaptiveHCodec(nn.Module):
    """Dual-stream adaptive-rate codec (codec_adaptive.py:28-209).

    encode(wav, feat) -> (acoustic_codes, semantic_codes) (B, G, nq) with group
    lengths injected into the indices; decode() reverses.
    """

    config: AdaptiveConfig = AdaptiveConfig()
    vq_axis_name: Optional[str] = None

    def setup(self):
        cfg = self.config.base
        self.encoder = SEANetEncoder(
            dimension=cfg.latent_dim, n_filters=cfg.seanet_filters,
            ratios=cfg.seanet_ratios, causal=cfg.causal, name="encoder",
        )
        self.semantic_encoder = SemanticEncoder(
            input_channels=cfg.feat_dim,
            encode_channels=cfg.semantic_encode_channels,
            out_channels=cfg.latent_dim,
            channel_ratios=cfg.semantic_ratios,
            strides=cfg.semantic_strides,
            name="semantic_encoder",
        )
        self.semantic_decoder = SemanticDecoder(
            code_dim=cfg.latent_dim,
            output_channels=cfg.feat_dim,
            decode_channels=cfg.semantic_encode_channels,
            channel_ratios=cfg.semantic_ratios,
            strides=cfg.semantic_strides,
            name="semantic_decoder",
        )
        agg_kwargs = dict(
            dim=cfg.latent_dim,
            num_heads=self.config.aggregator_heads,
            num_layers=self.config.aggregator_layers,
            dim_feedforward=self.config.aggregator_ff,
            context=self.config.aggregator_context,
        )
        self.acoustic_aggregator = QueryTokenAggregator(
            **agg_kwargs, name="acoustic_aggregator")
        self.semantic_aggregator = QueryTokenAggregator(
            **agg_kwargs, name="semantic_aggregator")
        vq_kwargs = dict(
            dim=cfg.latent_dim, codebook_size=cfg.codebook_size,
            num_quantizers=cfg.num_quantizers,
            quantize_dropout=cfg.quantize_dropout,
            axis_name=self.vq_axis_name,
        )
        self.quantizer = ResidualVQ(**vq_kwargs, name="quantizer")
        self.semantic_quantizer = ResidualVQ(**vq_kwargs, name="semantic_quantizer")
        self.bottleneck = MimiProjectedTransformer(
            d_model=self.config.bottleneck_dim or cfg.latent_dim * 2,
            input_dim=cfg.latent_dim * 2,
            output_dim=cfg.latent_dim * 2,
            num_layers=self.config.bottleneck_layers,
            num_heads=self.config.bottleneck_heads,
            dim_feedforward=self.config.bottleneck_ff,
            causal=False,
            context=self.config.bottleneck_context,
            name="bottleneck",
        )
        self.decoder = CodecDecoder10(
            dim=cfg.decoder_dim,
            intermediate_dim=cfg.decoder_intermediate_dim,
            convnext_layers=cfg.decoder_convnext_layers,
            n_fft=cfg.n_fft, hop_length=cfg.istft_hop, causal=cfg.causal,
            name="decoder",
        )

    def _threshold(self, threshold=None):
        """Resolve the similarity threshold (flexicodec_new.py:351-367):
        manual per-call override > dynamic uniform sample > fixed config."""
        if threshold is not None:
            return threshold
        c = self.config
        if c.threshold_mode == "dynamic":
            u = jax.random.uniform(self.make_rng("threshold"))
            return c.threshold_lower + u * (c.threshold_upper - c.threshold_lower)
        return c.similarity_threshold

    def _align(self, wav, feat, threshold=None):
        emb = self.encoder(wav)  # (B, T, D)
        sem = self.semantic_encoder(feat)  # (B, T, D)
        gid = similarity_group_ids(
            sem, self._threshold(threshold), self.config.max_group_len
        )
        a_groups, counts = self.acoustic_aggregator(emb, gid)
        s_groups, _ = self.semantic_aggregator(sem, gid)
        return a_groups, s_groups, gid, counts

    def __call__(self, wav, feat, train: bool = False, threshold=None):
        cfg = self.config.base
        a_groups, s_groups, gid, counts = self._align(wav, feat, threshold)
        qa, _, ca = self.quantizer(a_groups, train=train)
        qs, _, cs = self.semantic_quantizer(s_groups, train=train)
        frames = jnp.concatenate(
            [degroup(qa, gid), degroup(qs, gid)], axis=-1
        )
        frames = self.bottleneck(frames)
        recon = self.decoder(frames)
        pred_feat = self.semantic_decoder(degroup(qs, gid))
        return recon, pred_feat, jnp.mean(ca) + jnp.mean(cs)

    def encode(self, wav, feat, threshold=None):
        cfg = self.config.base
        a_groups, s_groups, gid, counts = self._align(wav, feat, threshold)
        a_codes = self.quantizer.encode(a_groups)  # (B, G, nq)
        s_codes = self.semantic_quantizer.encode(s_groups)
        a_codes = inject_length(a_codes, counts, cfg.codebook_size)
        s_codes = inject_length(s_codes, counts, cfg.codebook_size)
        return a_codes, s_codes

    def decode(self, acoustic_codes, semantic_codes):
        cfg = self.config.base
        a_plain, lengths = extract_length(acoustic_codes, cfg.codebook_size)
        s_plain, _ = extract_length(semantic_codes, cfg.codebook_size)
        t = int(jnp.asarray(acoustic_codes).shape[1])  # G == T frames
        gid = group_ids_from_lengths(lengths, t)
        qa = self.quantizer.decode(a_plain)
        qs = self.semantic_quantizer.decode(s_plain)
        frames = jnp.concatenate([degroup(qa, gid), degroup(qs, gid)], axis=-1)
        frames = self.bottleneck(frames)
        return self.decoder(frames)

    def token_rate(self, wav, feat, threshold=None):
        """Mean groups per second — the adaptive-rate diagnostic."""
        cfg = self.config.base
        *_, counts = self._align(wav, feat, threshold)
        groups = jnp.sum(counts > 0, axis=-1)
        seconds = wav.shape[1] / cfg.sample_rate
        return groups / seconds
