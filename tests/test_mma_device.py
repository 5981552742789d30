"""Device (jitted) MMA subproblem vs the NumPy reference.

The jitted single-constraint update must reproduce the NumPy MMA's
iterates exactly (same asymptote rule, bounds, dual bisection) — the
NumPy path stays as the oracle (VERDICT r1 item 8).
"""

import numpy as np

from pyfem_gpu_testflight_tpu.opt.mma import MMA, Problem


class _Quad(Problem):
    def __init__(self, n=50):
        super().__init__(n, 1)
        rng = np.random.RandomState(0)
        self.c = rng.rand(n) + 0.5
        self.w = rng.rand(n) + 0.5

    def getVarsAndBounds(self, x, lb, ub):
        x[:] = 0.5
        lb[:] = 0.0
        ub[:] = 1.0

    def evalObjCon(self, x):
        x = np.asarray(x, float)
        f = float(np.sum(self.c / (x + 0.1)))
        con = [0.4 * self.nvars - float(self.w.dot(x))]
        return 0, f, con

    def evalObjConGradient(self, x, g, A):
        x = np.asarray(x, float)
        g[:] = -self.c / (x + 0.1) ** 2
        A[0][:] = -self.w
        return 0


def test_device_mma_matches_numpy():
    opts = {"max_iterations": 20, "verbose": False}
    x_np = MMA(_Quad(), {**opts, "device": False}).optimize()
    x_dev = MMA(_Quad(), {**opts, "device": True}).optimize()
    assert np.abs(np.asarray(x_dev) - np.asarray(x_np)).max() < 1e-9


def test_device_mma_converges_feasible():
    prob = _Quad(80)
    opt = MMA(prob, {"max_iterations": 40, "verbose": False, "device": True})
    x = opt.optimize()
    _, _, con = prob.evalObjCon(np.asarray(x))
    assert con[0] > -1e-6  # feasible at the optimum (active constraint)
