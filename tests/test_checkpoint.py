"""Checkpoint round trips: npz (default) and orbax (sharded backend)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tq_tpu.utils.checkpoint import (
    load_params,
    load_params_orbax,
    save_params,
    save_params_orbax,
)


def _tree():
    return {
        "enc": {"w": jnp.arange(12.0).reshape(3, 4)},
        "rnn": [{"w_ih": jnp.ones((2, 8))}, {"w_ih": jnp.zeros((2, 8))}],
        "sf": jnp.float32(0.05),
    }


def test_npz_roundtrip(tmp_path):
    p = tmp_path / "ck.npz"
    save_params(p, _tree())
    back = load_params(p)
    np.testing.assert_array_equal(back["enc"]["w"],
                                  np.arange(12).reshape(3, 4))
    assert isinstance(back["rnn"], list) and len(back["rnn"]) == 2
    assert float(back["sf"]) == np.float32(0.05)


def test_npz_calibration_state_roundtrip(tmp_path):
    """Quantizer state (histogram + scale) checkpoints like params —
    the sweep-resumability requirement (SURVEY.md §5)."""
    from tq_tpu.layers.linear import init_quant_state

    qs = {"fc1": init_quant_state(), "fc2": init_quant_state()}
    qs["fc1"]["sf"] = jnp.float32(0.125)
    p = tmp_path / "qs.npz"
    save_params(p, qs)
    back = load_params(p)
    assert float(back["fc1"]["sf"]) == 0.125
    assert back["fc2"]["hist"].shape == (8192,)


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path):
    p = tmp_path / "orbax_ck"
    tree = _tree()
    save_params_orbax(p, tree)
    back = load_params_orbax(p, like=tree)
    np.testing.assert_array_equal(np.asarray(back["enc"]["w"]),
                                  np.arange(12).reshape(3, 4))


def test_packed_weight_roundtrip(tmp_path):
    """PackedWeight8 nodes keep their type through the flat npz (the
    '#nt' marker) so packed serving params checkpoint/restore."""
    import jax.numpy as jnp
    import numpy as np

    from tq_tpu.kernels.term_matmul import PackedWeight8, pack_weight_u8s
    from tq_tpu.utils.checkpoint import load_params, save_params

    w = jnp.asarray(np.arange(-8.0, 8.0).reshape(16, 1) * 0.01, jnp.float32)
    wp = pack_weight_u8s(w, jnp.float32(0.01), 8)
    tree = {"decoder": {"w": wp, "b": jnp.zeros((1,), jnp.float32)}}
    save_params(tmp_path / "packed.npz", tree)
    back = load_params(tmp_path / "packed.npz")
    w2 = back["decoder"]["w"]
    assert isinstance(w2, PackedWeight8)
    np.testing.assert_array_equal(np.asarray(wp.lo), w2.lo)
    np.testing.assert_array_equal(np.asarray(wp.signs), w2.signs)
    np.testing.assert_array_equal(np.asarray(wp.w_sf), w2.w_sf)


def test_npz_meta_and_store_dtype_marker(tmp_path):
    """ADVICE r4 #5 + #1: the store-dtype marker distinguishes
    narrowed-storage floats from genuine float16 params, and the meta
    side-channel carries the model family."""
    p16 = tmp_path / "narrow.npz"
    save_params(p16, _tree(), store_dtype=np.float16,
                meta={"model": "RNN_RELU"})
    back, meta = load_params(p16, with_meta=True)
    # Narrowed storage widens back to f32.
    assert back["enc"]["w"].dtype == np.float32
    assert meta["model"] == "RNN_RELU"
    assert meta["store_dtype"] == "float16"

    # Genuinely-f16 params (compute dtype) keep their dtype: the
    # marker says storage was NOT narrowed.
    pf = tmp_path / "f16.npz"
    tree = {"w": jnp.ones((2, 2), jnp.float16)}
    save_params(pf, tree)
    back = load_params(pf)
    assert back["w"].dtype == np.float16

    # Legacy files (no marker) keep the old widen-f16 convention.
    pl = tmp_path / "legacy.npz"
    np.savez(pl, w=np.ones((2, 2), np.float16))
    assert load_params(pl)["w"].dtype == np.float32


def test_reserved_meta_key_rejected(tmp_path):
    """A param tree using the reserved '__meta__' key fails loudly at
    save time (load would silently strip it into the meta dict)."""
    with pytest.raises(ValueError, match="reserved '__meta__'"):
        save_params(tmp_path / "x.npz",
                    {"__meta__": {"w": jnp.ones((2,))}})
