"""Property-based tests (hypothesis) for the two foundations every operator
rests on: the sufficient-statistics algebra and the formula autodiff."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fast_causal_inference_spark.formula import parse_formula
from fast_causal_inference_spark.operators.suffstats import (
    NumStats,
    merge_stats,
)


def _stats_of(X: np.ndarray) -> NumStats:
    n = len(X)
    return NumStats(n=float(n), means=X.mean(axis=0),
                    cov=np.cov(X, rowvar=False, ddof=1).reshape(
                        X.shape[1], X.shape[1]))


arrays = st.integers(2, 40).flatmap(
    lambda n: st.lists(
        st.tuples(st.floats(-50, 50, allow_nan=False),
                  st.floats(-50, 50, allow_nan=False)),
        min_size=n, max_size=n))


@settings(max_examples=60, deadline=None)
@given(arrays, arrays)
def test_merge_stats_equals_pooled(a, b):
    A, B = np.array(a), np.array(b)
    merged = merge_stats(_stats_of(A), _stats_of(B))
    pooled = _stats_of(np.vstack([A, B]))
    assert merged.n == pooled.n
    assert np.allclose(merged.means, pooled.means, rtol=1e-9, atol=1e-9)
    assert np.allclose(merged.cov, pooled.cov, rtol=1e-7, atol=1e-7)


@settings(max_examples=60, deadline=None)
@given(st.floats(0.5, 20, allow_nan=False),
       st.floats(0.5, 20, allow_nan=False),
       st.floats(0.5, 20, allow_nan=False))
def test_formula_gradient_matches_numeric(x0, x1, x2):
    """Symbolic gradient of a ratio-of-means formula == central difference."""
    node, base = parse_formula("avg(a)/avg(b) + avg(c)*avg(a)")
    k = len(base)
    mus = [x0, x1, x2][:k]
    grads = node.gradient(k)
    eps = 1e-6
    for i in range(k):
        up = list(mus); up[i] += eps
        dn = list(mus); dn[i] -= eps
        num = (node.value(up) - node.value(dn)) / (2 * eps)
        sym = grads[i].value(list(mus))
        assert np.isclose(sym, num, rtol=1e-4, atol=1e-6)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(-30, 30, allow_nan=False), min_size=3,
                max_size=60))
def test_exact_mw_distribution_sums_to_one(xs):
    from fast_causal_inference_spark.operators.mann_whitney import (
        _exact_u_pvalue,
    )

    n = len(xs)
    n1 = max(1, n // 3)
    n0 = n - n1
    # two-sided p at the median U is 1; extreme U is small but positive
    p_mid = _exact_u_pvalue(n0 * n1 / 2.0, n0, n1, "two-sided")
    assert 0.5 <= p_mid <= 1.0
    p_hi = _exact_u_pvalue(float(n0 * n1), n0, n1, "greater")
    assert 0.0 < p_hi <= 1.0
    # cdf + sf partition: less@u + greater@(u+1) == 1
    for u in (0, n0 * n1 // 2):
        less = _exact_u_pvalue(float(u), n0, n1, "less")
        greater = _exact_u_pvalue(float(u + 1), n0, n1, "greater")
        assert np.isclose(less + greater, 1.0, atol=1e-12)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=7),
                min_size=2, max_size=40),
       st.integers(0, 40))
def test_bpe_encode_word_always_reconstructs(words, n_merges):
    """Any learned merge table encodes any word losslessly (driver-side
    property — no Spark)."""
    from fast_causal_inference_spark.datapipe.tokenizer import (
        _learn_merges,
        bpe_encode_word,
    )

    counts = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    merges = _learn_merges(sorted(counts.items()), n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in set(words) | {"unseen", "zzz"}:
        toks = bpe_encode_word(w, ranks)
        assert "".join(toks).replace("</w>", "") == w
        assert toks[-1].endswith("</w>")


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(-50, 50, allow_nan=False), min_size=4,
                max_size=80, unique=True),
       st.integers(1, 10))
def test_bucket_by_edges_is_count_of_edges_leq(values, n_edges):
    """The balanced WHEN tree computes exactly #edges <= v (driver-side
    check of the expression builder via a numpy reimplementation of its
    recursion)."""
    import numpy as np

    edges = sorted(values[:n_edges])
    probe = values[n_edges:] + edges          # include exact-edge hits

    def ref(v):
        return sum(1 for e in edges if v >= e)

    # evaluate the recursion contract without Spark: simulate build()
    def tree(lo, hi, v):
        if lo == hi:
            return lo
        mid = (lo + hi) // 2
        return tree(mid + 1, hi, v) if v >= edges[mid] else tree(lo, mid, v)

    for v in probe:
        assert tree(0, len(edges), v) == ref(v)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=600),
       st.sampled_from([64, 192, 256, 4096]),
       st.sampled_from(["auto", "verbatim", "fixed", "lpc"]))
def test_flac_roundtrip_property(samples, block_size, method):
    """FLAC is lossless for EVERY in-range signal, block size and
    subframe method — hypothesis-driven complement of the fixed-seed
    parametrized round-trips."""
    import numpy as np

    from fast_causal_inference_spark.datapipe.flac import (
        decode_flac,
        encode_flac,
    )

    x = np.array(samples, dtype=np.int64)
    if method == "lpc" and len(x) < 2:
        return
    out, rate = decode_flac(encode_flac(x, 8000, block_size=block_size,
                                        method=method))
    assert rate == 8000
    assert np.array_equal(out, x)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(1, 16),
       st.booleans(), st.randoms(use_true_random=False))
def test_gif_roundtrip_property(h, w, ncol, interlace, rnd):
    import numpy as np

    from fast_causal_inference_spark.datapipe.gif import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(rnd.randrange(2 ** 31))
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncol, (h, w))]
    assert np.array_equal(decode_gif(encode_gif(img, interlace)), img)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 25), st.integers(1, 25), st.booleans(),
       st.sampled_from([8, 16]), st.randoms(use_true_random=False))
def test_png_roundtrip_property(h, w, interlace, depth, rnd):
    import numpy as np

    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(rnd.randrange(2 ** 31))
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint16)
    if depth == 8:
        payload = encode_png(img.astype(np.uint8), interlace=interlace)
    else:
        payload = encode_png(img * 257, bit_depth=16, interlace=interlace)
    assert np.array_equal(decode_png(payload), img.astype(np.uint8))


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20),
       st.sampled_from([(), ("subtract_green",), ("predictor",),
                        ("color",), ("subtract_green", "predictor")]),
       st.randoms(use_true_random=False))
def test_vp8l_roundtrip_property(h, w, transforms, rnd):
    """VP8L lossless round trip across random dims x transform sets —
    hypothesis-driven complement of the fixed-seed suite."""
    import numpy as np

    from fast_causal_inference_spark.datapipe.vp8l import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(rnd.randrange(2 ** 31))
    img = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(img, transforms))
    assert np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 2000), st.integers(1, 2),
       st.sampled_from([40, 64, 256]), st.booleans(),
       st.randoms(use_true_random=False))
def test_adpcm_decoder_mirrors_encoder_property(n, ch, block_align,
                                                use_ms, rnd):
    """decode(encode(x)) equals the encoder's internal reconstruction
    BIT-EXACTLY for any signal/shape — the lossy-codec analogue of
    round-trip equality (the encoder simulates the decoder)."""
    import numpy as np

    from fast_causal_inference_spark.datapipe.adpcm import (
        decode_ima_blocks,
        decode_ms_blocks,
        encode_ima_blocks,
        encode_ms_blocks,
    )

    rng = np.random.default_rng(rnd.randrange(2 ** 31))
    ba = block_align * ch
    x = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
    if use_ms:
        data, recon = encode_ms_blocks(x, ba)
        spb = (ba - 7 * ch) * 2 // ch + 2
        dec = decode_ms_blocks(data, ba, ch, spb)[:n]
    else:
        data, recon = encode_ima_blocks(x, ba)
        spb = (ba - 4 * ch) * 2 // ch + 1
        dec = decode_ima_blocks(data, ba, ch, spb)[:n]
    assert np.array_equal(dec, recon)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 1200), st.integers(-4000, 4000),
       st.integers(-3, 3), st.sampled_from([32, 64, 256]))
def test_adpcm_exact_signal_classes_property(n, a, d, block_align):
    """MSADPCM predictor 1 reproduces ANY arithmetic ramp exactly and
    IMA reproduces ANY constant exactly, at every block size — the
    identities the oracle gate rows rely on."""
    import numpy as np

    from fast_causal_inference_spark.datapipe.adpcm import (
        encode_wav_ima,
        encode_wav_ms,
    )
    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_wav,
    )

    ramp = (a + d * np.arange(n)).astype(np.int16)
    x, _ = decode_wav(encode_wav_ms(ramp, 16_000,
                                    block_align=block_align))
    assert np.array_equal(x, ramp)
    const = np.full(n, a, dtype=np.int16)
    y, _ = decode_wav(encode_wav_ima(const, 16_000,
                                     block_align=block_align))
    assert np.array_equal(y, const)
