"""Numerics guarding (utils/numerics.py) — SURVEY.md §5.2/§5.3."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meatmodeler_tpu.utils import numerics


def test_check_finite_noop_when_disabled(monkeypatch):
    monkeypatch.delenv("MEATMODELER_CHECK_NUMERICS", raising=False)
    numerics.check_finite("stage", bad=np.array([np.nan]))  # must not raise


def test_check_finite_raises_when_enabled(monkeypatch):
    monkeypatch.setenv("MEATMODELER_CHECK_NUMERICS", "1")
    numerics.check_finite("stage", good=np.ones(3))
    with pytest.raises(numerics.NumericsError, match="pose.*tvec.*2/6"):
        numerics.check_finite(
            "pose", tvec=np.array([[1.0, np.nan], [np.inf, 0.0], [0.0, 0.0]])
        )


def test_check_finite_ignores_integer_arrays(monkeypatch):
    monkeypatch.setenv("MEATMODELER_CHECK_NUMERICS", "1")
    numerics.check_finite("stage", idx=np.arange(5))


def test_checked_locates_nan_inside_jit():
    @numerics.checked
    @jax.jit
    def f(x):
        return jnp.log(x) * 2.0

    np.testing.assert_allclose(f(jnp.ones(3)), np.zeros(3))
    from jax.experimental import checkify

    with pytest.raises(checkify.JaxRuntimeError, match="nan"):
        f(-jnp.ones(3))


def test_checked_through_scan():
    @numerics.checked
    @jax.jit
    def f(xs):
        def step(c, x):
            return c, jnp.sqrt(x)

        return jax.lax.scan(step, 0.0, xs)[1]

    f(jnp.ones(4))
    from jax.experimental import checkify

    with pytest.raises(checkify.JaxRuntimeError):
        f(-jnp.ones(4))


def test_config_choice_validation():
    import dataclasses
    import pytest
    from meatmodeler_tpu.config import ChessboardConfig, PipelineConfig, TrackConfig

    with pytest.raises(ValueError, match="detector"):
        ChessboardConfig(detector="cv2")
    with pytest.raises(ValueError, match="triangulation"):
        TrackConfig(triangulation="n-view")
    with pytest.raises(ValueError, match="pass2_enhance"):
        PipelineConfig(pass2_enhance="gray")
