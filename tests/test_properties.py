"""Property-based tests (hypothesis) for the numeric kernels — the
analog of the reference's seeded property-style generators
(photon-test-utils SparkTestUtils.scala:85-833): random well-behaved
problems, invariant assertions, no Spark in the loop."""

import numpy as np
from hypothesis import given, settings, strategies as st

from photon_ml_spark.ml.hypersearch import halton
from photon_ml_spark.ml.local_glm import (
    _loss_derivs,
    _neg_log_likelihood,
    fit_local_glm,
)

FAMILIES = ["binomial", "gaussian", "poisson", "smoothed_hinge"]


@st.composite
def glm_problem(draw):
    seed = draw(st.integers(0, 2**31 - 1))
    n = draw(st.integers(20, 120))
    d = draw(st.integers(1, 4))
    family = draw(st.sampled_from(FAMILIES))
    rng = np.random.default_rng(seed)
    X = rng.normal(scale=0.8, size=(n, d))
    if family == "gaussian":
        y = rng.normal(size=n)
    elif family == "poisson":
        y = rng.poisson(1.5, size=n).astype(float)
    else:
        y = (rng.random(n) > 0.5).astype(float)
    w = rng.uniform(0.5, 2.0, size=n)
    return X, y, w, family


@settings(max_examples=25, deadline=None)
@given(glm_problem())
def test_fit_reaches_stationary_point(prob):
    """At the reported optimum the penalized gradient is ~0 (KKT for
    the unconstrained fit) for every family."""
    X, y, w, family = prob
    res = fit_local_glm(X, y, weight=w, family=family, l2=0.5, tol=1e-9)
    beta = np.concatenate([res["coefficients"], [res["intercept"]]])
    Z = np.hstack([X, np.ones((len(y), 1))])
    dl, _ = _loss_derivs(Z @ beta, y, family)
    grad = Z.T @ (w * dl)
    grad[:-1] += 0.5 * beta[:-1]  # l2 on coefficients, not intercept
    assert np.max(np.abs(grad)) < 1e-5


@settings(max_examples=25, deadline=None)
@given(
    st.integers(0, 2**31 - 1),
    st.sampled_from(FAMILIES),
)
def test_loss_derivative_matches_finite_difference(seed, family):
    rng = np.random.default_rng(seed)
    m = rng.normal(scale=2.0, size=30)
    if family == "gaussian":
        y = rng.normal(size=30)
    elif family == "poisson":
        y = rng.poisson(1.0, size=30).astype(float)
    else:
        y = (rng.random(30) > 0.5).astype(float)
    w = np.ones(30)
    dl, _ = _loss_derivs(m, y, family)
    eps = 1e-6
    i = int(rng.integers(0, 30))
    mp, mm = m.copy(), m.copy()
    mp[i] += eps
    mm[i] -= eps
    num = (
        _neg_log_likelihood(mp, y, w, family)
        - _neg_log_likelihood(mm, y, w, family)
    ) / (2 * eps)
    assert abs(num - dl[i]) < 5e-4 * max(1.0, abs(dl[i]))


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 512), st.integers(1, 6))
def test_halton_in_unit_cube_and_deterministic(n, dim):
    a = halton(n, dim)
    assert a.shape == (n, dim)
    assert np.all(a >= 0.0) and np.all(a < 1.0)
    assert np.array_equal(a, halton(n, dim))


@settings(max_examples=25, deadline=None)
@given(glm_problem())
def test_prior_pins_to_mean_as_precision_grows(prob):
    """M9 invariant: with precision → huge, the posterior collapses to
    the prior mean regardless of the data."""
    X, y, w, family = prob
    d = X.shape[1]
    mu = np.linspace(-0.3, 0.3, d + 1)
    res = fit_local_glm(
        X, y, weight=w, family=family,
        prior_mean=mu, prior_precision=np.full(d + 1, 1e10),
        x0=mu.copy(), tol=1e-10,
    )
    got = np.concatenate([res["coefficients"], [res["intercept"]]])
    assert np.allclose(got, mu, atol=1e-4)


# ---------------------------------------------------------------- codecs
# The stdlib media decoders (multimodal._png_decode/_wav_decode) are
# driver-side pure functions — property-test them against independent
# spec encoders, no Spark in the loop.


@st.composite
def png_case(draw):
    h = draw(st.integers(1, 12))
    w = draw(st.integers(1, 12))
    color_type, nch = draw(
        st.sampled_from([(0, 1), (4, 2), (2, 3), (6, 4)])
    )
    pixels = draw(
        st.lists(
            st.integers(0, 255), min_size=h * w * nch, max_size=h * w * nch
        )
    )
    filters = draw(st.lists(st.sampled_from([0, 1, 2, 3, 4]),
                            min_size=h, max_size=h))
    return h, w, color_type, nch, pixels, filters


@given(png_case())
@settings(max_examples=60, deadline=None)
def test_png_decode_matches_spec_encoder(case):
    """Any 8-bit gray/ga/RGB/RGBA image under any per-row filter mix
    must round-trip through the independent spec encoder to exact
    dimensions and Rec.601 mean luma."""
    from photon_ml_spark.operators.multimodal import _luma_mean, _png_decode
    from tests.test_pipeline_ops import _make_png

    h, w, color_type, nch, flat, filters = case
    pixels = np.array(flat, dtype=np.uint8).reshape(h, w, nch)
    payload = _make_png(pixels, color_type, filters=filters)
    gw, gh, luma = _png_decode(payload)
    assert (gw, gh) == (w, h)
    assert luma == _luma_mean(pixels)


@given(
    st.integers(1, 3),
    st.sampled_from([1, 2, 4]),
    st.sampled_from([8000, 16000, 44100]),
    st.lists(st.integers(-(2 ** 15), 2 ** 15 - 1), min_size=1, max_size=200),
)
@settings(max_examples=60, deadline=None)
def test_wav_decode_matches_numpy_rms(nch, width, rate, samples16):
    """Any PCM WAV (8/16/32-bit, 1-3 channels) decodes to the exact
    channel-averaged normalized RMS numpy computes independently."""
    import io
    import struct
    import wave

    from photon_ml_spark.operators.multimodal import _wav_decode

    frames = (len(samples16) // nch) * nch
    samples16 = samples16[:frames]
    if not samples16:
        samples16 = [0] * nch
        frames = nch
    if width == 1:
        raw = bytes((s >> 8) + 128 for s in samples16)
        norm = np.array(
            [(((s >> 8) + 128) - 128.0) / 128.0 for s in samples16]
        )
    elif width == 2:
        raw = struct.pack(f"<{frames}h", *samples16)
        norm = np.array(samples16, dtype=np.float64) / 32768.0
    else:
        scaled = [s << 16 for s in samples16]
        raw = struct.pack(f"<{frames}i", *scaled)
        norm = np.array(scaled, dtype=np.float64) / 2147483648.0
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(nch)
        wv.setsampwidth(width)
        wv.setframerate(rate)
        wv.writeframes(raw)
    got_rate, got_n, got_rms = _wav_decode(buf.getvalue())
    mono = norm.reshape(-1, nch).mean(axis=1)
    assert got_rate == rate
    assert got_n == frames // nch
    assert abs(got_rms - float(np.sqrt((mono * mono).mean()))) < 1e-12


# ------------------------------------------ hyperparameter rescaling


@st.composite
def bounds_and_point(draw):
    kinds = draw(
        st.lists(
            st.sampled_from(["linear", "log", "sqrt", "discrete"]),
            min_size=1, max_size=5,
        )
    )
    bounds, raw = [], []
    for k in kinds:
        if k == "log":
            lo = draw(st.floats(1e-6, 1e3))
            hi = lo * draw(st.floats(1.5, 1e6))
        elif k == "sqrt":
            lo = draw(st.floats(0.0, 10.0))
            hi = lo + draw(st.floats(0.5, 100.0))
        elif k == "discrete":
            lo = float(draw(st.integers(-20, 20)))
            hi = lo + float(draw(st.integers(1, 40)))
        else:
            lo = draw(st.floats(-1e3, 1e3))
            hi = lo + draw(st.floats(0.5, 1e3))
        bounds.append((lo, hi, k))
        if k == "discrete":
            raw.append(float(draw(st.integers(int(lo), int(hi)))))
        else:
            frac = draw(st.floats(0.0, 1.0))
            raw.append(lo + frac * (hi - lo))
    return bounds, np.array(raw)


@given(bounds_and_point())
@settings(max_examples=60, deadline=None)
def test_unit_rescaling_roundtrip_all_kinds(case):
    """_unit_backward inverts _unit_forward for every sampling kind
    (VectorRescaling scaleForward/scaleBackward + transform pair), and
    the unit image stays in [0, 1] — discrete points land strictly
    inside their equal-width cell."""
    from photon_ml_spark.ml.hypersearch import _unit_backward, _unit_forward

    bounds, raw = case
    u = _unit_forward(raw, bounds)
    assert np.all(u >= -1e-12) and np.all(u <= 1.0 + 1e-12)
    back = _unit_backward(u, bounds)
    assert np.allclose(back, raw, rtol=1e-9, atol=1e-9)
    # discrete dims sit below 1: value v occupies cell
    # [(v-lo)/n, (v-lo+1)/n) of n = hi-lo+1 cells
    for j, (lo, hi, kind) in enumerate(bounds):
        if kind == "discrete":
            assert u[j] < 1.0


@given(bounds_and_point(), st.floats(0.05, 0.5), st.integers(0, 99))
@settings(max_examples=30, deadline=None)
def test_shrink_box_always_inside_original_bounds(case, radius, seed):
    """shrink_search_range returns a non-empty box clipped inside the
    original bounds for ANY prior placement, radius, and seed — kinds
    preserved (ShrinkSearchRange.getBounds min/max clamp)."""
    import json

    from photon_ml_spark.ml.hypersearch import shrink_search_range

    bounds_list, raw = case
    names = [f"p{j}" for j in range(len(bounds_list))]
    bounds = dict(zip(names, bounds_list))
    records = [
        dict(zip(names, map(float, raw)), evaluationValue=1.0),
        dict(
            zip(names, (lo for lo, _, _ in bounds_list)),
            evaluationValue=0.0,
        ),
    ]
    shrunk = shrink_search_range(
        bounds, json.dumps({"records": records}),
        radius=radius, seed=seed, candidate_pool_size=64,
    )
    assert set(shrunk) == set(bounds)
    for nm in names:
        lo0, hi0, kind0 = bounds[nm]
        lo, hi, kind = shrunk[nm]
        assert kind == kind0
        assert lo0 - 1e-9 <= lo <= hi <= hi0 + 1e-9
        assert hi >= lo  # non-empty
