"""Profiling/logging utility tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pranet2_tpu.utils.logging_utils import AvgMeter, setup_logging
from pranet2_tpu.utils.profiling import cost_analysis, count_params, throughput


def test_cost_analysis_matmul():
    a = jnp.ones((64, 64))
    stats = cost_analysis(lambda x: x @ x, a)
    # 2*M*N*K = 524288 flops
    assert stats["flops"] >= 2 * 64 ** 3 * 0.5  # backend may fold; sanity only


def test_throughput_runs():
    a = jnp.ones((8, 32))
    f = jax.jit(lambda x: x * 2)
    ips = throughput(f, (a,), batch_size=8, iters=5, warmup=1)
    assert ips > 0


def test_count_params():
    v = {"params": {"w": jnp.zeros((3, 4)), "b": jnp.zeros((4,))}}
    assert count_params(v) == 16


def test_avg_meter_window():
    m = AvgMeter(num=3)
    for i in range(10):
        m.update(float(i))
    assert m.show() == (7 + 8 + 9) / 3
    assert m.avg == sum(range(10)) / 10


def test_setup_logging(tmp_path):
    log = setup_logging(str(tmp_path))
    log.info("hello")
    assert (tmp_path / "log.txt").read_text().strip().endswith("hello")
