"""Protein mutation-landscape benchmark with one-hot features.

Parity: stpy/test_functions/protein_benchmark.py:10 (ProteinOperator:
amino-acid translation tables, mutation codes, one-hot intervals) and :138
(ProteinBenchmark: pandas-backed mutation dataset; here data is passed in as
arrays/dataframe — the reference's bundled .xlsx is not shipped).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from stpy_tpu.config import default_dtype

AMINO_ACIDS = list("ARNDCQEGHILKMFPSTWYV")


class ProteinOperator:
    def __init__(self):
        self.dictionary = {aa: i for i, aa in enumerate(AMINO_ACIDS)}
        self.inv_dictionary = {i: aa for i, aa in enumerate(AMINO_ACIDS)}
        self.q = len(AMINO_ACIDS)

    def translate_amino_acid(self, letter):
        return self.dictionary[letter]

    def translate(self, X):
        """Letters (n, d) -> integer codes (n, d)."""
        X = np.atleast_2d(np.asarray(X))
        return np.vectorize(lambda a: self.dictionary[a])(X)

    def translate_mutation_series(self, series):
        return np.asarray([self.dictionary[s] for s in series])

    def translate_one_hot(self, X):
        """Integer codes (n, d) -> one-hot (n, d*q)."""
        X = np.atleast_2d(np.asarray(X)).astype(int)
        n, d = X.shape
        out = np.zeros((n, d * self.q))
        for j in range(d):
            out[np.arange(n), j * self.q + X[:, j]] = 1.0
        return jnp.asarray(out, default_dtype())

    def get_variant_code(self, mutation):
        """'A123T' -> (position 123, from 'A', to 'T')."""
        return int(mutation[1:-1]), mutation[0], mutation[-1]

    def get_substitutes_from_mutation(self, mutation):
        pos, src, dst = self.get_variant_code(mutation)
        return pos, self.dictionary[src], self.dictionary[dst]

    def mutation(self, original_seq, positions, new_seq):
        s = list(original_seq)
        for p, c in zip(positions, new_seq):
            s[p] = c
        return "".join(s)

    def interval_number(self, dim=None):
        d = dim or 1
        from stpy_tpu.utils.helper import cartesian

        return jnp.asarray(
            cartesian([np.arange(self.q)] * d), default_dtype()
        )

    def interval_onehot(self, dim=None):
        codes = np.asarray(self.interval_number(dim)).astype(int)
        return self.translate_one_hot(codes)

    def interval_letters(self, dim=None):
        codes = np.asarray(self.interval_number(dim)).astype(int)
        return [
            "".join(self.inv_dictionary[c] for c in row) for row in codes
        ]


class ProteinBenchmark:
    """Mutation dataset benchmark. `data` = (variants, values) where
    variants are integer-coded (n, dim) arrays (or letter arrays)."""

    def __init__(self, data, dim=1, ref=None, avg=False, scale=True):
        self.op = ProteinOperator()
        variants, values = data
        variants = np.asarray(variants)
        if variants.dtype.kind in "UO":
            variants = self.op.translate(variants)
        self.X_codes = variants.astype(int)
        y = np.asarray(values, dtype=float).reshape(-1, 1)
        self.dim = dim
        self.ref = ref
        if scale:
            self.y_scale = np.abs(y).max() or 1.0
            y = y / self.y_scale
        self.y = jnp.asarray(y, default_dtype())
        self.X = self.op.translate_one_hot(self.X_codes)

    @classmethod
    def from_file(cls, fname, dim=1, ref=("D", "D", "D", "D"), avg=False,
                  scale=True, positions=4, fitness_col="Fitness"):
        """Load a mutation dataset file with the REFERENCE's semantics
        (stpy/test_functions/protein_benchmark.py:138-181): columns
        P1..P{positions} hold per-position amino-acid letters, `fitness_col`
        the response; rows are masked to those whose trailing
        (positions - dim) sites equal `ref`'s, and Fitness is scaled by its
        max. Format by suffix: .csv (always available), .h5/.hdf
        (pd.read_hdf — needs pytables), .xlsx (pd.read_excel — needs
        openpyxl); the reference bundles .h5/.xlsx, neither engine ships in
        this environment, so the tested path is the CSV round-trip of the
        same pipeline (tests/test_data_benchmarks.py)."""
        import pandas as pd

        fname = str(fname)
        if fname.endswith((".h5", ".hdf", ".hdf5")):
            dset = pd.read_hdf(fname)
        elif fname.endswith((".xlsx", ".xls")):
            dset = pd.read_excel(fname)
        else:
            dset = pd.read_csv(fname)
        if not avg:
            mask = np.full(dset.shape[0], True, dtype=bool)
            for j in range(positions - dim):
                mask &= (
                    dset[f"P{positions - j}"] == ref[positions - 1 - j]
                ).to_numpy()
            dset = dset[mask]
        cols = [f"P{i + 1}" for i in range(dim)]
        variants = dset[cols].to_numpy()
        values = dset[fitness_col].to_numpy(dtype=float)
        if scale and values.size:
            values = values / (np.max(values) or 1.0)
        # scaling already applied reference-style (divide by max, which
        # can flip signs exactly as the reference does for negative max)
        return cls((variants, values), dim=dim, ref=list(ref), scale=False)

    @classmethod
    def synthetic(cls, dim=2, n=256, key=0, epistasis=0.3, noise=0.0):
        """Generate a synthetic mutation landscape so the benchmark is
        exercisable without the reference's bundled .xlsx: fitness = additive
        per-site effects + pairwise epistasis on one-hot codes, the standard
        NK-landscape-style generative model. Returns (benchmark, truth_fn)
        where truth_fn maps integer codes -> noiseless fitness."""
        rng = np.random.default_rng(key)
        op = ProteinOperator()
        q = op.q
        codes = rng.integers(0, q, size=(n, dim))
        w_site = rng.standard_normal((dim, q))
        w_pair = epistasis * rng.standard_normal((dim, dim, q, q))

        def truth_fn(codes):
            codes = np.atleast_2d(np.asarray(codes)).astype(int)
            f = w_site[np.arange(dim), codes].sum(axis=1)
            for a in range(dim):
                for b in range(a + 1, dim):
                    f = f + w_pair[a, b, codes[:, a], codes[:, b]]
            return f.reshape(-1, 1)

        y = truth_fn(codes)
        if noise:
            y = y + noise * rng.standard_normal(y.shape)
        return cls((codes, y), dim=dim), truth_fn

    def data_summary(self):
        return {
            "n": int(self.X.shape[0]),
            "dim": self.dim,
            "features": int(self.X.shape[1]),
        }

    def eval_noiseless(self, X_codes):
        """Nearest-dataset lookup (the benchmark is tabular)."""
        X_codes = np.atleast_2d(np.asarray(X_codes)).astype(int)
        out = np.zeros((X_codes.shape[0], 1))
        for i, row in enumerate(X_codes):
            match = np.where((self.X_codes == row).all(axis=1))[0]
            out[i, 0] = float(self.y[match[0], 0]) if len(match) else np.nan
        return jnp.asarray(out, default_dtype())

    def get_data(self):
        return self.X, self.y
