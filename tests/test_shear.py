"""Shear-protocol unit tests against the reference formulas
(SpecificShearFunction.h; VariantShearFunction.h:46-48)."""

import numpy as np
import pytest

from pse_tpu import shear


def test_steady():
    f = shear.steady(dt=0.01, shear_rate=2.0, zero=10)
    assert float(f.shear_rate(123)) == 2.0
    np.testing.assert_allclose(float(f.strain(30)), 2.0 * 20 * 0.01, rtol=1e-12)


def test_steady_default_is_zero_rate():
    f = shear.steady(dt=0.0)
    assert float(f.shear_rate(5)) == 0.0
    assert float(f.strain(5)) == 0.0


def test_sine():
    dt, rate, freq = 1e-3, 1.5, 2.0
    f = shear.sine(dt=dt, shear_rate=rate, shear_freq=freq, zero=0)
    for t in (0, 37, 251):
        time = t * dt
        np.testing.assert_allclose(
            float(f.shear_rate(t)), rate * np.cos(freq * 2 * np.pi * time), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(f.strain(t)),
            rate * np.sin(freq * 2 * np.pi * time) / freq / 2 / np.pi,
            rtol=1e-5, atol=1e-9,
        )
    # rate is the time derivative of strain
    eps = 1
    num = (float(f.strain(100 + eps)) - float(f.strain(100 - eps))) / (2 * eps * dt)
    np.testing.assert_allclose(num, float(f.shear_rate(100)), rtol=1e-3)


def test_sine_validation():
    with pytest.raises(ValueError):
        shear.sine(dt=1e-3, shear_rate=0.0, shear_freq=1.0)
    with pytest.raises(ValueError):
        shear.sine(dt=1e-3, shear_rate=1.0, shear_freq=-1.0)


def test_chirp_rate_is_strain_derivative():
    f = shear.chirp(dt=1e-3, amplitude=0.5, omega_0=1.0, omega_f=50.0, periodT=3.0)
    for t in (100, 1000, 2500):
        num = (float(f.strain(t + 1)) - float(f.strain(t - 1))) / (2e-3)
        np.testing.assert_allclose(num, float(f.shear_rate(t)), rtol=2e-3)
    # At t=0 the phase is 0: strain 0, rate amp*omega_0
    np.testing.assert_allclose(float(f.strain(0)), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(f.shear_rate(0)), 0.5 * 1.0, rtol=1e-6)


def test_tukey_window():
    dt, periodT, param = 1e-3, 1.0, 0.4
    f = shear.tukey_window(dt=dt, periodT=periodT, tukey_param=param)
    # outside [0, T]: zero
    assert float(f.strain(-5)) == 0.0
    assert float(f.strain(2000)) == 0.0
    assert float(f.shear_rate(2000)) == 0.0
    # flat middle: strain 1, rate 0
    assert float(f.strain(500)) == 1.0
    assert float(f.shear_rate(500)) == 0.0
    # ramp region: value in (0,1), rate = d(strain)/dt
    t = 100
    num = (float(f.strain(t + 1)) - float(f.strain(t - 1))) / (2 * dt)
    np.testing.assert_allclose(num, float(f.shear_rate(t)), rtol=1e-3)
    with pytest.raises(ValueError):
        shear.tukey_window(dt=dt, periodT=1.0, tukey_param=1.5)


def test_windowed_product_rule():
    base = shear.sine(dt=1e-3, shear_rate=1.0, shear_freq=1.0)
    win = shear.tukey_window(dt=1e-3, periodT=1.0, tukey_param=0.5)
    f = shear.windowed(base, win)
    for t in (100, 400, 700):
        np.testing.assert_allclose(
            float(f.strain(t)), float(base.strain(t)) * float(win.strain(t)), rtol=1e-6
        )
        expected_rate = float(base.shear_rate(t)) * float(win.strain(t)) + float(
            base.strain(t)
        ) * float(win.shear_rate(t))
        np.testing.assert_allclose(float(f.shear_rate(t)), expected_rate, rtol=1e-5)


def test_wrap_strain():
    np.testing.assert_allclose(float(shear.wrap_strain(0.3)), 0.3, rtol=1e-6)
    np.testing.assert_allclose(float(shear.wrap_strain(0.7)), -0.3, atol=1e-6)
    np.testing.assert_allclose(float(shear.wrap_strain(-0.6)), 0.4, atol=1e-6)
    np.testing.assert_allclose(float(shear.wrap_strain(1.5)), -0.5, atol=1e-6)


def test_shear_variant_clamps_time_range():
    base = shear.steady(dt=0.01, shear_rate=1.0, zero=100)
    v = shear.shear_variant(base, total_timestep=200, max_strain=0.5)
    assert float(v.value(50)) == 0.0                      # before offset
    np.testing.assert_allclose(float(v.value(140)), 0.4, atol=1e-6)
    # the wrap interval is half-open: strain 0.5 lands on -0.5
    np.testing.assert_allclose(float(v.value(150)), -0.5, atol=1e-6)
    end = float(v.value(300))
    assert float(v.value(1000)) == end                    # frozen after end
    with pytest.raises(ValueError):
        shear.shear_variant(base, total_timestep=0)
