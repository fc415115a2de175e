"""Math/profiling utilities."""

from radixhashjoin_tpu.utils import (OpProfiler, is_prime, next_pow2,
                                     next_prime, pow2)


def test_next_prime():
    # reference behavior (auxFun.cpp:4-22): smallest prime >= n
    assert next_prime(1) == 2
    assert next_prime(2) == 2
    assert next_prime(8) == 11
    assert next_prime(7919) == 7919
    assert next_prime(7920) == 7927


def test_is_prime_edges():
    assert not is_prime(0) and not is_prime(1)
    assert is_prime(2) and is_prime(3) and not is_prime(9)
    assert is_prime(2**31 - 1)   # Mersenne


def test_pow2():
    assert pow2(0) == 1 and pow2(10) == 1024
    assert next_pow2(1) == 1 and next_pow2(1025) == 2048


def test_profiler_report_disabled_is_noop():
    p = OpProfiler(False)
    assert p.record("x", 42, (None,)) == 42
    assert p.report() == "(no ops recorded)"


def test_profiler_counts_input_and_output_bytes():
    import jax.numpy as jnp
    p = OpProfiler(True)
    x = jnp.zeros(1000, jnp.int32)
    out = (jnp.zeros(500, jnp.int32), jnp.zeros((), jnp.int32))
    got = p.record("op", out, (x,))
    assert got is out
    s = p.ops["op"]
    assert s.calls == 1 and s.seconds > 0
    # bytes = input (4000) + result leaves (2000 + 4), exact
    assert s.bytes == 4000 + 2000 + 4
    assert "op" in p.report()
