"""Round-5 TPU batch — the dedicated df general-ν Matérn family
(ops/matern_df.py, ROADMAP "dedicated df Bessel") vs the generic
interpreter row recorded by exp_r5_generic_acc2/generic_tail.

Same workload as the generic done-bar (n=8192, d=8, matern ν=1.2,
γ=0.8, host scipy f64 reference) — after kernels/df_plan.py routes
general-ν matern to fam="matern_gen", gp.fit_predict exercises the
node-scanned tier end-to-end (train Gram, cross Gram, df diag k**).

Run on the TPU host: timeout 7200 python benchmarks/exp_r5_matern_gen.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_r5_generic_acc2 import matern_nu64, run


def main():
    from stpy_tpu.kernels import KernelFunction
    from stpy_tpu.kernels.df_plan import df_atom_desc

    mk = lambda: KernelFunction(kernel_name="matern", nu=1.2, gamma=0.8,
                                d=8)
    fams = [f for (_, f, _, _, _, _) in df_atom_desc(mk())]
    assert fams == ["matern_gen"], fams
    run("matern_nu1.2", mk, lambda a, b: matern_nu64(a, b, 0.8, 1.2),
        expect_generic=False)
    print("R5_MATERN_GEN_DONE", flush=True)


if __name__ == "__main__":
    main()
