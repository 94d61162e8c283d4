"""Unit tests for diffusion schedules and posteriors.

Oracles are independent numpy re-derivations of the published formulas
(DDPM arXiv:2006.11239, DDIM arXiv:2010.02502, D3PM arXiv:2107.03006) with
the reference's exact conventions, used for differential testing.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difusco_tpu import diffusion as dfn


def _np_cos_abar(T):
    offset = 0.008
    t = np.arange(0, T + 1, 1)
    f = np.cos(math.pi * 0.5 * (t / T + offset) / (1 + offset)) ** 2
    return f / f[0]


class TestBetas:
    def test_linear_endpoints(self):
        beta = dfn.make_betas(1000, "linear")
        assert beta.shape == (1000,)
        assert beta[0] == pytest.approx(1e-4)
        assert beta[-1] == pytest.approx(2e-2)

    def test_cosine_matches_closed_form(self):
        T = 100
        beta = dfn.make_betas(T, "cosine")
        abar = _np_cos_abar(T)
        expected = np.clip(1 - abar[1:] / abar[:-1], None, 0.999)
        np.testing.assert_allclose(beta, expected, rtol=1e-12)


class TestGaussianSchedule:
    def test_indexing_convention(self):
        s = dfn.gaussian_schedule(10, "linear")
        assert s.T == 10
        assert s.alpha.shape == (11,)
        assert s.alphabar.shape == (11,)
        assert float(s.alpha[0]) == 1.0
        assert float(s.alphabar[0]) == 1.0
        # alphabar[t] = prod_{s<=t} (1 - beta_s)
        beta = np.asarray(s.beta)
        np.testing.assert_allclose(
            np.asarray(s.alphabar)[1:], np.cumprod(1 - beta), rtol=1e-6
        )

    def test_q_sample_statistics(self):
        s = dfn.gaussian_schedule(1000, "linear")
        key = jax.random.PRNGKey(0)
        x0 = jnp.ones((512, 8, 8))
        t = jnp.full((512,), 500, jnp.int32)
        xt, eps = dfn.gaussian_q_sample(s, x0, t, key)
        abar = float(s.alphabar[500])
        assert float(xt.mean()) == pytest.approx(np.sqrt(abar), abs=0.01)
        assert float(xt.std()) == pytest.approx(np.sqrt(1 - abar), abs=0.01)
        # exact reconstruction identity
        recon = (xt - jnp.sqrt(1 - abar) * eps) / np.sqrt(abar)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(x0), atol=1e-4)


class TestCategoricalSchedule:
    def test_qbar_matches_sequential_matmul(self):
        T = 50
        s = dfn.categorical_schedule(T, "cosine")
        beta = dfn.make_betas(T, "cosine").reshape(-1, 1, 1)
        Qs = (1 - beta) * np.eye(2)[None] + (beta / 2) * np.ones((2, 2))[None]
        Q_bar = [np.eye(2)]
        for Q in Qs:
            Q_bar.append(Q_bar[-1] @ Q)
        np.testing.assert_allclose(np.asarray(s.Q_bar), np.stack(Q_bar), atol=1e-7)

    def test_rows_stochastic_symmetric(self):
        s = dfn.categorical_schedule(1000, "linear")
        Q = np.asarray(s.Q_bar)
        np.testing.assert_allclose(Q.sum(-1), 1.0, atol=1e-6)
        np.testing.assert_allclose(Q, np.swapaxes(Q, -1, -2), atol=1e-7)

    def test_q_sample_marginals(self):
        s = dfn.categorical_schedule(1000, "linear")
        key = jax.random.PRNGKey(1)
        x0 = jnp.ones((4, 100, 100))
        t = jnp.array([1, 10, 500, 1000], jnp.int32)
        xt = dfn.categorical_q_sample(s, x0, t, key)
        Q = np.asarray(s.Q_bar)
        for i, ti in enumerate([1, 10, 500, 1000]):
            # x0=1 -> P(x_t=1) = Q_bar[t][1,1]
            assert float(xt[i].mean()) == pytest.approx(Q[ti, 1, 1], abs=0.02)


class TestCategoricalPosterior:
    def _oracle(self, Q_bar, t, s, x0_prob, xt_bits):
        """Unnormalized two-term D3PM update, replicating the reference's
        exact arithmetic (pl_meta_model.py:115-137) in plain numpy."""
        Q_t = np.linalg.inv(Q_bar[s]) @ Q_bar[t]
        xt1h = np.eye(2)[xt_bits.astype(int)]
        part1 = xt1h @ Q_t.T
        p = np.zeros(xt_bits.shape)
        for x0 in (0, 1):
            denom = (Q_bar[t][x0] * xt1h).sum(-1, keepdims=True)
            q = part1 * Q_bar[s][x0] / denom
            p += q[..., 1] * x0_prob[..., x0]
        return p

    def test_matches_oracle_probabilities(self):
        T = 100
        sched = dfn.categorical_schedule(T, "cosine")
        Q_bar = np.asarray(sched.Q_bar, np.float64)
        rng = np.random.default_rng(0)
        xt = (rng.random((6, 6)) > 0.5).astype(np.float32)
        x0p1 = rng.random((6, 6)).astype(np.float32)
        x0_prob = np.stack([1 - x0p1, x0p1], axis=-1)

        for t, s in [(100, 80), (50, 25), (10, 0), (1, 0)]:
            expected = self._oracle(Q_bar, t, s, x0_prob, xt)
            # target_t == 0 returns clamped probabilities deterministically
            out = dfn.categorical_posterior(
                sched, jnp.int32(t), jnp.int32(0), jnp.asarray(x0_prob),
                jnp.asarray(xt), jax.random.PRNGKey(0),
            )
            exp0 = np.maximum(self._oracle(Q_bar, t, 0, x0_prob, xt), 0.0)
            np.testing.assert_allclose(np.asarray(out), exp0, atol=1e-4)
            if s > 0:
                # For target_t > 0 verify the Bernoulli mean against the oracle
                keys = jax.random.split(jax.random.PRNGKey(42), 600)
                samp = jax.vmap(
                    lambda k: dfn.categorical_posterior(
                        sched, jnp.int32(t), jnp.int32(s),
                        jnp.asarray(x0_prob), jnp.asarray(xt), k,
                    )
                )(keys)
                mean = np.asarray(samp).mean(0)
                np.testing.assert_allclose(
                    mean, np.clip(expected, 0, 1), atol=0.08
                )

    def test_identity_when_t_equals_target(self):
        # t == target_t => Q_t = I and the update must keep P(x_{t-1}=x_t)=1
        # regardless of the model prediction (sanity for the Bayes algebra).
        sched = dfn.categorical_schedule(100, "linear")
        xt = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
        x0_prob = jnp.full((2, 2, 2), 0.5)
        out = dfn.categorical_posterior(
            sched, jnp.int32(50), jnp.int32(50), x0_prob, xt, jax.random.PRNGKey(0)
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(xt), atol=1e-5)


class TestGaussianPosterior:
    def test_ddim_matches_closed_form(self):
        sched = dfn.gaussian_schedule(1000, "linear")
        ab = np.asarray(sched.alphabar, np.float64)
        rng = np.random.default_rng(3)
        xt = rng.standard_normal((4, 4)).astype(np.float32)
        eps = rng.standard_normal((4, 4)).astype(np.float32)
        t, s = 500, 400
        out = dfn.gaussian_posterior(
            sched, jnp.int32(t), jnp.int32(s), jnp.asarray(eps), jnp.asarray(xt),
            jax.random.PRNGKey(0), use_ddim=True,
        )
        expected = np.sqrt(ab[s] / ab[t]) * (xt - np.sqrt(1 - ab[t]) * eps)
        expected = expected + np.sqrt(1 - ab[s]) * eps
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)

    def test_ddpm_mean_and_variance(self):
        sched = dfn.gaussian_schedule(1000, "linear")
        ab = np.asarray(sched.alphabar, np.float64)
        al = np.asarray(sched.alpha, np.float64)
        be = np.asarray(sched.beta, np.float64)
        xt = np.ones((8, 8), np.float32)
        eps = np.zeros((8, 8), np.float32)
        t = 300
        keys = jax.random.split(jax.random.PRNGKey(7), 2000)
        outs = jax.vmap(
            lambda k: dfn.gaussian_posterior(
                sched, jnp.int32(t), jnp.int32(t - 1), jnp.asarray(eps),
                jnp.asarray(xt), k, use_ddim=False,
            )
        )(keys)
        outs = np.asarray(outs)
        mean = 1 / np.sqrt(al[t])  # (xt - 0) / sqrt(alpha_t) with xt = 1
        var = be[t - 1] * (1 - ab[t - 1]) / (1 - ab[t])
        assert outs.mean() == pytest.approx(mean, abs=0.01)
        assert outs.std() == pytest.approx(np.sqrt(var), abs=0.01)

    def test_ddim_falls_back_to_ddpm_at_t1(self):
        sched = dfn.gaussian_schedule(1000, "linear")
        xt = jnp.ones((2, 2))
        eps = jnp.zeros((2, 2))
        a = dfn.gaussian_posterior(
            sched, jnp.int32(1), jnp.int32(0), eps, xt, jax.random.PRNGKey(5), True
        )
        b = dfn.gaussian_posterior(
            sched, jnp.int32(1), jnp.int32(0), eps, xt, jax.random.PRNGKey(5), False
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestInferenceTimePairs:
    def _oracle(self, schedule, T, steps):
        """Direct re-derivation of InferenceSchedule (diffusion_schedulers.py:91-109)."""
        out = []
        for i in range(steps):
            if schedule == "linear":
                t1 = T - int((float(i) / steps) * T)
                t2 = T - int((float(i + 1) / steps) * T)
            else:
                t1 = T - int(np.sin((float(i) / steps) * np.pi / 2) * T)
                t2 = T - int(np.sin((float(i + 1) / steps) * np.pi / 2) * T)
            out.append((int(np.clip(t1, 1, T)), int(np.clip(t2, 0, T - 1))))
        return out

    @pytest.mark.parametrize("schedule", ["linear", "cosine"])
    @pytest.mark.parametrize("steps", [1, 10, 50, 1000])
    def test_matches_reference_semantics(self, schedule, steps):
        T = 1000
        pairs = dfn.inference_time_pairs(schedule, T, steps)
        assert pairs.shape == (steps, 2)
        oracle = self._oracle(schedule, T, steps)
        for i, (t1, t2) in enumerate(oracle):
            assert pairs[i, 0] == t1
            assert pairs[i, 1] == t2
        # trajectory starts at T and ends at 0
        assert pairs[0, 0] == T
        assert pairs[-1, 1] == 0
        # chained: t2 of step i == t1 of step i+1 except for clipping edges
        for i in range(steps - 1):
            assert pairs[i, 1] in (pairs[i + 1, 0], pairs[i + 1, 0] - 0)


class TestScanCompatibility:
    def test_categorical_denoise_loop_scans(self):
        """The posterior must compose into a single lax.scan over time pairs."""
        sched = dfn.categorical_schedule(1000, "cosine")
        pairs = jnp.asarray(dfn.inference_time_pairs("cosine", 1000, 10))
        xt = (jax.random.normal(jax.random.PRNGKey(0), (6, 6)) > 0).astype(jnp.float32)

        def step(carry, tpair):
            xt, key = carry
            key, sub = jax.random.split(key)
            # stand-in "model": predict x0 = xt with prob 0.9
            x0_prob = jnp.stack([1 - 0.9 * xt - 0.05, 0.9 * xt + 0.05], axis=-1)
            xt = dfn.categorical_posterior(sched, tpair[0], tpair[1], x0_prob, xt, sub)
            return (xt, key), None

        (out, _), _ = jax.lax.scan(step, (xt, jax.random.PRNGKey(1)), pairs)
        assert out.shape == xt.shape
        arr = np.asarray(out)
        assert np.isfinite(arr).all()
        assert (arr >= 0).all() and (arr <= 1).all()
