"""Dipole-dipole pseudosection of the notebook survey (C18 scene).

Reference: ``tests/testNotebook.ipynb`` cell 15 plots the SimPEG FEM
pseudosection with ``plot_pseudosection``; this renders the same
conductor+resistor model from the multi-source MC sweep (ONE walker
ensemble for every source dipole).

Usage: python examples/pseudosection_figure.py [--walks N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--walks", type=int, default=2000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "notebook_pseudosection.png"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from dcrmontecarlo_tpu.models import notebook_survey
    from dcrmontecarlo_tpu.solver import SolverOptions
    from dcrmontecarlo_tpu.survey import run_pseudosection
    from dcrmontecarlo_tpu.utils.plotting import plot_pseudosection

    survey, electrodes = notebook_survey()
    survey.source_mis = True
    ps = run_pseudosection(
        survey, electrodes, num_rx_per_src=8,
        n_walks=args.walks, max_steps=6000, eps=1.0, seed=0,
        options=SolverOptions(target_slots=65536,
                              common_random_numbers=True),
    )
    plot_pseudosection(ps, save_path=args.out)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
