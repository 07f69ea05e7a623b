import numpy as np

from microimagelib_tpu.ops.powell import EvalCounter, powell


def test_quadratic_minimum():
    # costs stay below the reference's 1.001 abort threshold (NCC-like domain)
    def f(x):
        return float(0.05 * ((x[0] - 3.0) ** 2 + 2.0 * (x[1] + 1.0) ** 2) - 0.9)

    p, fmin, iters, counter = powell(np.array([0.0, 0.0]), f, 1e-6, 10000)
    np.testing.assert_allclose(p, [3.0, -1.0], atol=1e-2)
    assert fmin < -0.9 + 1e-3
    assert counter.count > 0


def test_rosenbrock_like():
    def f(x):
        return float(0.05 * ((1 - x[0]) ** 2 + 5.0 * (x[1] - x[0] ** 2) ** 2) - 0.9)

    p, fmin, _, _ = powell(np.array([-1.0, 1.0]), f, 1e-8, 100000)
    np.testing.assert_allclose(p, [1.0, 1.0], atol=5e-2)


def test_cost_abort_escape():
    # cost starting >= 1.001 returns immediately (reference:src/api_powell.c:317)
    calls = []

    def f(x):
        calls.append(1)
        return 5.0

    p, fmin, iters, _ = powell(np.array([0.0]), f, 1e-4, 1000)
    assert len(calls) == 1
    assert iters == 0


def test_it_limit_caps_evals():
    def f(x):
        return float(0.01 * np.sum(x**2) - 0.9)

    p, fmin, _, counter = powell(np.arange(5, dtype=float), f, 1e-12, 7)
    # like the reference, the cap is only checked between line minimizations,
    # so one linmin's evals (tens) may overshoot — but not a full extra cycle
    assert counter.count <= 7 + 60


def test_shared_counter_across_stages():
    def f(x):
        return float(0.05 * np.sum((x - 1) ** 2) - 0.9)

    c = EvalCounter(f)
    powell(np.zeros(2), f, 1e-6, 10000, counter=c)
    n1 = c.count
    powell(np.zeros(2), f, 1e-6, 10000, counter=c)
    assert c.count > n1
