"""Device challenger == host challenger, bit for bit (incl. grind)."""

import numpy as np

from ziren_tpu.core.challenger import DuplexChallenger
from ziren_tpu.ops import jfield as jf
from ziren_tpu.ops.jchallenger import JChallenger


def _mont(v):
    import jax.numpy as jnp

    return jnp.uint32((int(v) << 32) % 2130706433)


def _canon(x):
    import jax

    return int(jax.device_get(jf.mont_decode(x)))


def test_transcript_matches_host():
    rng = np.random.default_rng(3)
    h = DuplexChallenger()
    seed = rng.integers(0, 2130706433, size=5, dtype=np.uint32)
    h.observe_slice(seed)
    d = JChallenger.from_host(h.clone())

    # interleaved observes and samples, crossing duplex boundaries
    vals = rng.integers(0, 2130706433, size=23, dtype=np.uint32)
    h.observe_slice(vals)
    d.observe_host_slice(vals)
    for _ in range(3):
        assert _canon(d.sample_mont()) == h.sample()
    more = rng.integers(0, 2130706433, size=9, dtype=np.uint32)
    h.observe_slice(more)
    d.observe_mont_vec(jf.mont_encode(__import__("jax.numpy", fromlist=["x"]).asarray(more)))
    assert np.array_equal(
        np.array([_canon(x) for x in [d.sample_mont() for _ in range(4)]]),
        h.sample_ext(),
    )
    assert int(__import__("jax").device_get(d.sample_bits(19))) == h.sample_bits(19)


def test_grind_matches_host():
    rng = np.random.default_rng(4)
    h = DuplexChallenger()
    h.observe_slice(rng.integers(0, 2130706433, size=11, dtype=np.uint32))
    d = JChallenger.from_host(h.clone())
    hw = h.grind(12)
    dw = int(__import__("jax").device_get(d.grind(12)))
    assert hw == dw
    # transcripts stay aligned after the grind replay
    assert _canon(d.sample_mont()) == h.sample()
