"""utils/param_pack: bit-exact pack/unpack of parameter pytrees into one
flat buffer per dtype (remote-dispatch arg-marshaling optimization used by
the serving engine's in-prefill SSL frontend)."""
import numpy as np
import jax
import jax.numpy as jnp

from unified_audio_tpu.utils.param_pack import (pack_pytree, spec_abstract,
                                                unpack_pytree)


def _tree():
    rng = np.random.default_rng(0)
    return {
        "conv": {"kernel": jnp.asarray(
            rng.standard_normal((3, 4, 5)).astype(np.float32)),
            "bias": jnp.asarray(rng.standard_normal(5).astype(np.float32))},
        "norm": {"scale": jnp.asarray(
            rng.standard_normal(7).astype(np.float16))},
        "steps": jnp.asarray([3, 1, 4], np.int32),
        "layers": [jnp.asarray(rng.standard_normal((2, 2))
                               .astype(np.float32)),
                   jnp.asarray(rng.standard_normal((1,))
                               .astype(np.float32))],
    }


def test_roundtrip_bit_exact():
    tree = _tree()
    buffers, spec = pack_pytree(tree)
    assert set(buffers) == {"float32", "float16", "int32"}
    assert all(b.ndim == 1 for b in buffers.values())
    out = unpack_pytree(buffers, spec, tree)
    assert jax.tree_util.tree_structure(out) == \
        jax.tree_util.tree_structure(tree)
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(out)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unpack_traces_under_jit():
    tree = _tree()
    buffers, spec = pack_pytree(tree)

    @jax.jit
    def use(bufs):
        t = unpack_pytree(bufs, spec, tree)
        return t["conv"]["kernel"].sum() + t["layers"][0].sum()

    want = tree["conv"]["kernel"].sum() + tree["layers"][0].sum()
    np.testing.assert_allclose(np.asarray(use(buffers)), np.asarray(want),
                               rtol=1e-6)


def test_spec_abstract_matches():
    tree = _tree()
    _, spec = pack_pytree(tree)
    ab = spec_abstract(spec, tree)
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(ab)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_skeleton_unpack():
    """Unpack can rebuild through a ShapeDtypeStruct skeleton (what the
    engine closes over — no weight constants in the jitted program)."""
    tree = _tree()
    buffers, spec = pack_pytree(tree)
    skeleton = jax.tree_util.tree_map(
        lambda p: jax.ShapeDtypeStruct(jnp.shape(p), jnp.asarray(p).dtype),
        tree)
    out = unpack_pytree(buffers, spec, skeleton)
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
