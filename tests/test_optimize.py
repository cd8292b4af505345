"""Optimizer behavioral tests (reference: SignalSharp.Tests/Optimization/
with shared objective functions in ObjectiveFunctions.cs)."""

import math

import pytest

from signalsharp_ray.kernels.optimize import (
    GridSearchOptimizer,
    GridSearchOptions,
    NelderMeadOptimizer,
    NelderMeadOptions,
    ParameterDefinition,
)


def quadratic(params):
    # minimum at x=3, y=-2
    return (params["x"] - 3.0) ** 2 + (params["y"] + 2.0) ** 2


def rosenbrock(params):
    x, y = params["x"], params["y"]
    return (1 - x) ** 2 + 100 * (y - x * x) ** 2


class TestGridSearch:
    def test_finds_quadratic_minimum(self):
        opt = GridSearchOptimizer(GridSearchOptions(default_grid_steps=13))
        res = opt.optimize(
            quadratic,
            [ParameterDefinition("x", 0, 6), ParameterDefinition("y", -5, 1)],
        )
        assert res.success
        assert res.best_parameters["x"] == pytest.approx(3.0, abs=0.5)
        assert res.best_parameters["y"] == pytest.approx(-2.0, abs=0.5)
        assert res.function_evaluations == 169

    def test_refinement_improves(self):
        coarse = GridSearchOptimizer(GridSearchOptions(default_grid_steps=4))
        refined = GridSearchOptimizer(
            GridSearchOptions(default_grid_steps=4, enable_adaptive_refinement=True)
        )
        defs = [ParameterDefinition("x", 0, 6), ParameterDefinition("y", -5, 1)]
        assert (
            refined.optimize(quadratic, defs).minimized_metric
            <= coarse.optimize(quadratic, defs).minimized_metric
        )

    def test_eval_cap_subsamples(self):
        opt = GridSearchOptimizer(
            GridSearchOptions(default_grid_steps=20, max_function_evaluations=50)
        )
        res = opt.optimize(
            quadratic,
            [ParameterDefinition("x", 0, 6), ParameterDefinition("y", -5, 1)],
        )
        assert res.function_evaluations <= 50

    def test_early_stopping(self):
        opt = GridSearchOptimizer(
            GridSearchOptions(default_grid_steps=100, early_stopping_threshold=1.0)
        )
        res = opt.optimize(
            lambda p: abs(p["x"]), [ParameterDefinition("x", -10, 10)]
        )
        assert res.function_evaluations < 100

    def test_log_scale(self):
        opt = GridSearchOptimizer(
            GridSearchOptions(default_grid_steps=21, use_logarithmic_scale_for={"x"})
        )
        res = opt.optimize(
            lambda p: abs(math.log10(p["x"]) + 2),  # min at x = 0.01
            [ParameterDefinition("x", 1e-4, 1.0)],
        )
        assert res.best_parameters["x"] == pytest.approx(0.01, rel=0.5)

    def test_objective_exceptions_skipped(self):
        def partial(p):
            if p["x"] < 0:
                raise RuntimeError("invalid")
            return p["x"]

        res = GridSearchOptimizer().optimize(
            partial, [ParameterDefinition("x", -5, 5)]
        )
        assert res.success
        assert res.best_parameters["x"] >= 0


class TestNelderMead:
    def test_quadratic(self):
        res = NelderMeadOptimizer().optimize(
            quadratic,
            [
                ParameterDefinition("x", -10, 10, initial_guess=0.0),
                ParameterDefinition("y", -10, 10, initial_guess=0.0),
            ],
        )
        assert res.success
        assert res.best_parameters["x"] == pytest.approx(3.0, abs=1e-2)
        assert res.best_parameters["y"] == pytest.approx(-2.0, abs=1e-2)

    def test_rosenbrock_with_multistart(self):
        opts = NelderMeadOptions(
            enable_multi_start=True, max_restarts=2, max_iterations=2000
        )
        res = NelderMeadOptimizer(opts).optimize(
            rosenbrock,
            [
                ParameterDefinition("x", -2, 2, initial_guess=-1.0),
                ParameterDefinition("y", -1, 3, initial_guess=1.0),
            ],
        )
        assert res.minimized_metric < 1e-3

    def test_bounds_respected(self):
        res = NelderMeadOptimizer().optimize(
            lambda p: -p["x"],  # pushes toward upper bound
            [ParameterDefinition("x", 0, 1, initial_guess=0.5)],
        )
        assert res.best_parameters["x"] <= 1.0 + 1e-12
        assert res.best_parameters["x"] == pytest.approx(1.0, abs=1e-3)

    def test_eval_budget(self):
        opts = NelderMeadOptions(max_function_evaluations=30)
        res = NelderMeadOptimizer(opts).optimize(
            quadratic,
            [
                ParameterDefinition("x", -10, 10, initial_guess=0.0),
                ParameterDefinition("y", -10, 10, initial_guess=0.0),
            ],
        )
        assert res.function_evaluations <= 40  # budget + final simplex evals
