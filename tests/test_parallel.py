"""SPMD tests on the 8-device CPU mesh: dp x tp sharded train step runs,
matches the unsharded loss, and updates parameters."""
import numpy as np
import pytest
# whole-file slow tier: 1069s serial on this box (/tmp/test_timings.txt round-5 capture); the fast tier
# (-m 'not golden and not slow') targets <10 min
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from unified_audio_tpu.models.bicodec.bicodec import BiCodecConfig
from unified_audio_tpu.models.bicodec.tokenizer import BiCodecTokenizer
from unified_audio_tpu.models.lm.llama import LlamaConfig
from unified_audio_tpu.models.ssl import wav2vec2 as ssl_mod
from unified_audio_tpu.models.unise.model import UniSE, UniSEConfig
from unified_audio_tpu.parallel import mesh as mesh_lib
from unified_audio_tpu.train.optim import make_optimizer, warmup_exp_decay_schedule
from unified_audio_tpu.train.sft_trainer import SFTTrainer

from tests.test_unise import tiny_bicodec_cfg, tiny_ssl_cfg


def build_unise(key):
    k1, k2, k3 = jax.random.split(key, 3)
    tok = BiCodecTokenizer.from_random(k1, tiny_bicodec_cfg(), tiny_ssl_cfg(32))
    wavlm_cfg = tiny_ssl_cfg(24)
    wavlm = ssl_mod.Wav2Vec2Model(wavlm_cfg)
    wavlm_vars = wavlm.init(k2, jnp.zeros((1, 16320)))
    cfg = UniSEConfig(
        segment_seconds=0.4, feats_dim=24, global_tokens=4,
        llm=LlamaConfig(global_size=64, semantic_size=64, hidden_size=32,
                        num_layers=2, num_heads=4),
    )
    return UniSE(cfg, tok, wavlm_cfg, wavlm_vars, rng={"params": k3})


class TestMesh:
    def test_make_mesh(self):
        mesh = mesh_lib.make_mesh(tp=2)
        assert mesh.shape == {"dp": 4, "tp": 2}

    def test_param_shardings_rules(self, key):
        unise = build_unise(key)
        mesh = mesh_lib.make_mesh(tp=2)
        sh = mesh_lib.param_shardings(unise.sft_params, mesh)
        flat = jax.tree_util.tree_flatten_with_path(sh)[0]
        specs = {
            "/".join(str(getattr(k, "key", k)) for k in kp): v.spec
            for kp, v in flat
        }
        # stacked (nn.scan) params carry a leading layer axis; specs are
        # right-aligned so the logical dims keep their sharding
        qspec = [v for k, v in specs.items() if "qkv_proj" in k][0]
        assert qspec == P(None, None, "tp")
        ospec = [v for k, v in specs.items() if "o_proj" in k][0]
        assert ospec == P(None, "tp", None)


class TestDistributed:
    def test_initialize_single_process_noop(self):
        from unified_audio_tpu.parallel import distributed

        distributed.initialize()  # must not raise or try to connect

    def test_hybrid_mesh_single_slice(self):
        from unified_audio_tpu.parallel.distributed import make_hybrid_mesh

        mesh = make_hybrid_mesh(ici=dict(dp=2, tp=4))
        assert mesh.shape == {"dp": 2, "tp": 4}
        # trainer rules apply unchanged on the hybrid-built mesh
        from unified_audio_tpu.parallel import mesh as mesh_lib

        s = mesh_lib.batch_sharding(mesh)
        assert "dp" in str(s.spec)

    def test_hybrid_mesh_dcn_axis_merges(self):
        from unified_audio_tpu.parallel.distributed import make_hybrid_mesh

        # dcn dp=2 x ici dp=1: single host has no multi-slice topology, but
        # the axis algebra must still produce dp_total=2 over 8 devices
        mesh = make_hybrid_mesh(ici=dict(dp=1, tp=4), dcn=dict(dp=2))
        assert mesh.shape == {"dp": 2, "tp": 4}

    def test_hybrid_mesh_wrong_size_raises(self):
        from unified_audio_tpu.parallel.distributed import make_hybrid_mesh

        with pytest.raises(ValueError):
            make_hybrid_mesh(ici=dict(dp=3, tp=4))


class TestSchedule:
    def test_warmup_then_decay(self):
        sch = warmup_exp_decay_schedule(peak_lr=1.0, warmup_steps=100,
                                        step_decay=0.99, min_factor=0.1)
        assert float(sch(0)) < 1e-6
        np.testing.assert_allclose(float(sch(100)), 1.0, rtol=1e-5)
        assert 0.3 < float(sch(200)) < 0.4  # 0.99^100 ~ 0.366
        np.testing.assert_allclose(float(sch(100000)), 0.1, rtol=1e-5)


class TestSPMDTraining:
    def test_sharded_step_matches_unsharded(self, rng):
        key = jax.random.PRNGKey(0)
        b, t = 8, 6400
        mix = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
        target = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))

        unise1 = build_unise(key)
        tr_plain = SFTTrainer(unise1, mesh=None,
                              optimizer=make_optimizer(warmup_steps=1))
        loss_plain, _ = tr_plain.train_step("se", None, mix, target)

        unise2 = build_unise(key)
        mesh = mesh_lib.make_mesh(tp=2)
        tr_spmd = SFTTrainer(unise2, mesh=mesh,
                             optimizer=make_optimizer(warmup_steps=1))
        loss_spmd, _ = tr_spmd.train_step("se", None, mix, target)

        np.testing.assert_allclose(loss_plain, loss_spmd, rtol=2e-3)

    def test_multi_step_training_progresses(self, key, rng):
        unise = build_unise(key)
        mesh = mesh_lib.make_mesh(tp=2)
        tr = SFTTrainer(unise, mesh=mesh,
                        optimizer=make_optimizer(peak_lr=1e-3, warmup_steps=4))
        b, t = 8, 6400
        mix = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
        target = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
        losses = []
        for task in ("se", "tse", "rtse"):
            enroll = mix if task != "se" else None
            loss, acc = tr.train_step(task, enroll, mix, target)
            assert np.isfinite(loss)
            losses.append(loss)
        assert tr.step == 3

    def test_sft_overfits_single_batch(self, key, rng):
        """Repeating ONE (task, batch) drives the SFT loss well below its
        starting value — the training loop LEARNS (frozen-variable jit
        threading, optimizer, LR schedule all wired end to end)."""
        unise = build_unise(key)
        tr = SFTTrainer(unise, optimizer=make_optimizer(peak_lr=3e-3,
                                                        warmup_steps=2))
        b, t = 4, 6400
        mix = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
        target = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
        first, _ = tr.train_step("se", None, mix, target)
        last = first
        for _ in range(20):
            last, _ = tr.train_step("se", None, mix, target)
        assert last < 0.8 * first, (first, last)


class TestPretrain:
    def test_pretrain_steps(self, rng):
        from unified_audio_tpu.models.lm.llama import LlamaConfig
        from unified_audio_tpu.train.optim import make_optimizer
        from unified_audio_tpu.train.pretrain import PretrainTrainer

        cfg = LlamaConfig(global_size=16, semantic_size=32, hidden_size=32,
                          num_layers=2, num_heads=4)
        mesh = mesh_lib.make_mesh(tp=2)
        tr = PretrainTrainer(cfg, jax.random.PRNGKey(0),
                             optimizer=make_optimizer(warmup_steps=2),
                             mesh=mesh)
        losses = []
        for i in range(3):
            g = jnp.asarray(rng.integers(0, 16, (8, 4)))
            s = jnp.asarray(rng.integers(0, 32, (8, 12)))
            loss, acc = tr.train_step(g, s)
            assert np.isfinite(loss)
            losses.append(loss)
        assert tr.step == 3


class TestValidator:
    def test_validation_pass(self, key, rng):
        from unified_audio_tpu.train.sft_trainer import Validator

        unise = build_unise(key)
        v = Validator(unise)
        b, t = 2, 6400
        batches = []
        for mode in ("se", "tse"):
            mix = rng.standard_normal((b, t)).astype(np.float32)
            speech = rng.standard_normal((b, t)).astype(np.float32)
            enroll = mix if mode != "se" else None
            batches.append((mode, enroll, jnp.asarray(mix),
                            jnp.asarray(speech), jnp.asarray(mix),
                            None, None, None))
        out = v.run(unise.sft_params, batches)
        assert out["num_batches"] == 2
        assert np.isfinite(out["valid_loss"]) and 0 <= out["valid_acc"] <= 1


class TestExpertParallel:
    """Real EP correctness: the MoE expert axis sharded over tp must give
    the SAME forward output and gradients as replicated execution (SURVEY
    §2.4 'TPU-native equivalents'; the reference's MoE is single-device,
    transformer.py:286-287 hints at the intended all_reduce)."""

    def _moe(self, rng):
        from unified_audio_tpu.nn.transformer import Transformer

        moe = Transformer(hidden_size=16, intermediate_size=32, num_heads=4,
                          num_layers=2, use_moe=True, moe_experts=4,
                          moe_topk=2)
        x = jnp.asarray(rng.standard_normal((8, 6, 16)).astype(np.float32))
        params = moe.init(jax.random.PRNGKey(7), x)
        return moe, params, x

    def test_sharded_forward_matches_replicated(self, rng):
        moe, params, x = self._moe(rng)
        y_ref = moe.apply(params, x)

        mesh = mesh_lib.make_mesh(dp=2, tp=4)
        shardings = mesh_lib.param_shardings(params, mesh)
        # the expert axis must actually be sharded over tp
        flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
        ep_specs = [s.spec for kp, s in flat
                    if "expert_w1" in "/".join(str(k.key) for k in kp)]
        assert ep_specs and all("tp" in str(sp) for sp in ep_specs), ep_specs

        p_sh = jax.device_put(params, shardings)
        x_sh = jax.device_put(x, mesh_lib.batch_sharding(mesh))
        y_sh = jax.jit(moe.apply)(p_sh, x_sh)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sh),
                                   atol=2e-5)

    def test_sharded_grads_match_replicated(self, rng):
        moe, params, x = self._moe(rng)

        def loss(p, xx):
            return jnp.mean(jnp.square(moe.apply(p, xx)))

        g_ref = jax.grad(loss)(params, x)

        mesh = mesh_lib.make_mesh(dp=2, tp=4)
        p_sh = jax.device_put(params, mesh_lib.param_shardings(params, mesh))
        x_sh = jax.device_put(x, mesh_lib.batch_sharding(mesh))
        g_sh = jax.jit(jax.grad(loss))(p_sh, x_sh)

        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_sh = jax.tree_util.tree_leaves_with_path(g_sh)
        for (pa, a), (pb, b) in zip(flat_ref, flat_sh):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5, err_msg=str(pa))


class TestPipelineParallel:
    """GPipe over the stacked layer axis (parallel/pipeline.py): the
    pipelined forward and its gradients must equal the dense layer scan."""

    def _backbone(self, rng, num_layers=4):
        from unified_audio_tpu.models.lm.llama import (LlamaBackbone,
                                                       LlamaConfig)

        cfg = LlamaConfig(global_size=16, semantic_size=32, hidden_size=32,
                          num_layers=num_layers, num_heads=4)
        backbone = LlamaBackbone(cfg)
        embeds = jnp.asarray(
            rng.standard_normal((8, 12, 32)).astype(np.float32))
        params = backbone.init(jax.random.PRNGKey(3), embeds)
        return cfg, backbone, params, embeds

    def test_pipeline_matches_dense(self, rng):
        from unified_audio_tpu.nn.transformer import RMSNorm
        from unified_audio_tpu.parallel.pipeline import llama_pipeline_forward

        cfg, backbone, params, embeds = self._backbone(rng)
        y_ref = backbone.apply(params, embeds)

        mesh = mesh_lib.make_mesh_axes(dp=2, pp=4)
        y_pipe = llama_pipeline_forward(
            cfg, params["params"]["layers"], embeds, mesh, n_microbatches=4)
        y_pipe = RMSNorm(cfg.hidden_size).apply(
            {"params": params["params"]["norm"]}, y_pipe)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_pipe),
                                   atol=2e-5)

    def test_pipeline_grads_match_dense(self, rng):
        from unified_audio_tpu.parallel.pipeline import llama_pipeline_forward

        cfg, backbone, params, embeds = self._backbone(rng, num_layers=8)
        layer_params = params["params"]["layers"]
        mesh = mesh_lib.make_mesh_axes(pp=8)

        def loss_dense(lp):
            p = {"params": {"layers": lp, "norm": params["params"]["norm"]}}
            return jnp.mean(jnp.square(backbone.apply(p, embeds)))

        def loss_pipe(lp):
            y = llama_pipeline_forward(cfg, lp, embeds, mesh,
                                       n_microbatches=4, axis="pp")
            from unified_audio_tpu.nn.transformer import RMSNorm

            y = RMSNorm(cfg.hidden_size).apply(
                {"params": params["params"]["norm"]}, y)
            return jnp.mean(jnp.square(y))

        g_ref = jax.grad(loss_dense)(layer_params)
        g_pipe = jax.jit(jax.grad(loss_pipe))(layer_params)
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_pipe = jax.tree_util.tree_leaves_with_path(g_pipe)
        for (pa, a), (pb, b) in zip(flat_ref, flat_pipe):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, err_msg=str(pa))

    def test_bad_microbatch_raises(self, rng):
        from unified_audio_tpu.parallel.pipeline import llama_pipeline_forward

        cfg, _, params, embeds = self._backbone(rng)
        mesh = mesh_lib.make_mesh_axes(dp=2, pp=4)
        with pytest.raises(ValueError):
            llama_pipeline_forward(cfg, params["params"]["layers"], embeds,
                                   mesh, n_microbatches=3)


class TestSequenceParallel:
    """All-gather-KV sequence parallelism (parallel/sequence.py): the
    time-sharded forward must equal the dense layer scan on the same
    stacked params."""

    def test_sp_forward_matches_dense(self, rng):
        from unified_audio_tpu.models.lm.llama import (LlamaBackbone,
                                                       LlamaConfig)
        from unified_audio_tpu.nn.transformer import RMSNorm
        from unified_audio_tpu.parallel.sequence import (
            llama_sequence_parallel_forward)

        cfg = LlamaConfig(global_size=16, semantic_size=32, hidden_size=32,
                          num_layers=3, num_heads=4)
        backbone = LlamaBackbone(cfg)
        embeds = jnp.asarray(
            rng.standard_normal((2, 24, 32)).astype(np.float32))
        params = backbone.init(jax.random.PRNGKey(5), embeds)
        y_ref = backbone.apply(params, embeds)

        mesh = mesh_lib.make_mesh_axes(dp=2, sp=4)
        y_sp = llama_sequence_parallel_forward(
            cfg, params["params"]["layers"], embeds, mesh)
        y_sp = RMSNorm(cfg.hidden_size).apply(
            {"params": params["params"]["norm"]}, y_sp)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sp),
                                   atol=2e-5)

    def test_sp_rejects_ragged_sequence(self, rng):
        from unified_audio_tpu.models.lm.llama import LlamaConfig
        from unified_audio_tpu.parallel.sequence import (
            llama_sequence_parallel_forward)

        cfg = LlamaConfig(global_size=16, semantic_size=32, hidden_size=32,
                          num_layers=2, num_heads=4)
        mesh = mesh_lib.make_mesh_axes(sp=8)
        with pytest.raises(ValueError):
            llama_sequence_parallel_forward(
                cfg, {}, jnp.zeros((1, 30, 32)), mesh)


class TestShardedServing:
    """Tensor-parallel paged decode: the serving hot path under a tp mesh
    (LM kernels sharded by LM_RULES, KV pool sharded over heads) must equal
    unsharded execution — GSPMD inserts the collectives."""

    def test_paged_decode_tp_matches_unsharded(self, rng):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from unified_audio_tpu.models.lm.llama import LlamaConfig
        from unified_audio_tpu.models.lm.sft import LLMSFT
        from unified_audio_tpu.serve.paged import init_pool, paged_decode_ids

        cfg = LlamaConfig(global_size=16, semantic_size=32, hidden_size=32,
                          num_layers=2, num_heads=4)
        sft = LLMSFT(cfg, num_tasks=3, feats_dim=12)
        params = sft.init(
            jax.random.PRNGKey(0), 0, None, jnp.zeros((1, 6, 12)),
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 6), jnp.int32),
        )
        lm_params = params["params"]["lm"]

        s_slots, bs, mb = 3, 4, 4
        nb = 1 + s_slots * mb
        pool = init_pool(cfg, nb, bs)
        pool = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape).astype(np.float32)), pool)
        tables = jnp.asarray(
            np.arange(1, 1 + s_slots * mb).reshape(s_slots, mb), jnp.int32)
        index = jnp.asarray([5, 9, 0], jnp.int32)
        active = jnp.ones((s_slots,), bool)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (s_slots,)),
                          jnp.int32)

        ref_logits, ref_pool = paged_decode_ids(
            cfg, lm_params, pool, tables, index, active, ids, bs)

        mesh = mesh_lib.make_mesh(dp=2, tp=4)
        lm_sh = jax.device_put(lm_params,
                               mesh_lib.param_shardings(lm_params, mesh))
        # flat (L, NB, BS, H*hd) pool: heads are contiguous column ranges,
        # so tp-sharding the flat dim == head-sharding (H % tp == 0)
        head_spec = NamedSharding(mesh, P(None, None, None, "tp"))
        pool_sh = jax.tree_util.tree_map(
            lambda p: jax.device_put(p, head_spec), pool)

        fn = jax.jit(lambda lp, pl: paged_decode_ids(
            cfg, lp, pl, tables, index, active, ids, bs))
        sh_logits, sh_pool = fn(lm_sh, pool_sh)
        np.testing.assert_allclose(np.asarray(ref_logits),
                                   np.asarray(sh_logits), atol=2e-4)
        np.testing.assert_allclose(np.asarray(ref_pool["k"]),
                                   np.asarray(sh_pool["k"]), atol=2e-5)


class TestPipelineTrainer:
    """pp integrated into the TRAINER (SURVEY §2.4): one SFTTrainer step
    with the backbone pipelined equals the dense step — loss AND updated
    params (i.e. grads) match."""

    def test_pp_train_step_matches_dense(self, rng):
        from tests.test_parallel import build_unise  # self-module helper

        key = jax.random.PRNGKey(0)
        b, t = 8, 6400
        mix = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
        target = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))

        unise1 = build_unise(key)
        tr_plain = SFTTrainer(unise1, optimizer=make_optimizer(
            warmup_steps=1))
        loss_plain, _ = tr_plain.train_step("se", None, mix, target)

        unise2 = build_unise(key)
        pp_mesh = mesh_lib.make_mesh_axes(dp=4, pp=2)  # num_layers=2
        tr_pp = SFTTrainer(unise2, pp_mesh=pp_mesh, pp_microbatches=2,
                           optimizer=make_optimizer(warmup_steps=1))
        loss_pp, _ = tr_pp.train_step("se", None, mix, target)

        np.testing.assert_allclose(loss_plain, loss_pp, rtol=2e-3)
        # updated params equal -> the pipelined grads equal the dense grads
        flat1 = jax.tree_util.tree_leaves(tr_plain.params)
        flat2 = jax.tree_util.tree_leaves(tr_pp.params)
        for a, b_ in zip(flat1, flat2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4)

    def test_mesh_and_pp_mesh_exclusive(self, key):
        unise = build_unise(key)
        mesh = mesh_lib.make_mesh(tp=2)
        pp_mesh = mesh_lib.make_mesh_axes(dp=4, pp=2)
        with pytest.raises(ValueError):
            SFTTrainer(unise, mesh=mesh, pp_mesh=pp_mesh)
