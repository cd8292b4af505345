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


class TestGridSearchReferenceParity:
    """Behavioral fixtures ported from
    /root/reference/SignalSharp.Tests/Optimization/GridSearchOptimizerTests.cs
    (shared objectives from ObjectiveFunctions.cs): exact function-
    evaluation counts, failure-result semantics, option interplay."""

    def test_no_parameters_returns_failure_result(self):
        # GridSearchOptimizerTests.cs OptimizeAsync_NoParameters_ReturnsFailure
        res = GridSearchOptimizer().optimize(lambda p: 0.0, [])
        assert res.success is False
        assert res.message == "No parameters to optimize."
        assert math.isnan(res.minimized_metric)
        assert res.best_parameters == {}
        assert res.function_evaluations == 0

    def test_1d_quadratic_exact_eval_count(self):
        # :69-89 — 11 steps over [0, 5], target 2.0 on a grid point
        res = GridSearchOptimizer(GridSearchOptions(default_grid_steps=11)).optimize(
            lambda p: (p["x"] - 2.0) ** 2, [ParameterDefinition("x", 0.0, 5.0)]
        )
        assert res.success
        assert abs(res.minimized_metric) < 1e-9
        assert abs(res.best_parameters["x"] - 2.0) < 1e-4
        assert res.function_evaluations == 11

    def test_2d_quadratic_exact_eval_count(self):
        # :92-113 — 6x6 grid, targets (2, 3) on grid points
        res = GridSearchOptimizer(GridSearchOptions(default_grid_steps=6)).optimize(
            lambda p: (p["x"] - 2.0) ** 2 + (p["y"] - 3.0) ** 2,
            [ParameterDefinition("x", 0.0, 5.0), ParameterDefinition("y", 0.0, 5.0)],
        )
        assert res.success
        assert abs(res.minimized_metric) < 1e-9
        assert abs(res.best_parameters["x"] - 2.0) < 1e-4
        assert abs(res.best_parameters["y"] - 3.0) < 1e-4
        assert res.function_evaluations == 36

    def test_all_evaluations_fail_returns_failure(self):
        # :137-154 — throwing objective: success False, +inf, 3 evals
        def boom(p):
            raise RuntimeError("Test exception from objective function.")

        res = GridSearchOptimizer(GridSearchOptions(default_grid_steps=3)).optimize(
            boom, [ParameterDefinition("x", 0.0, 1.0)]
        )
        assert res.success is False
        assert math.isinf(res.minimized_metric)
        assert res.best_parameters == {}
        assert res.function_evaluations == 3
        assert "failed to find any valid parameters" in res.message

    def test_per_parameter_steps_override(self):
        # :162-187 — x: 3 steps, y: 6 steps -> 18 evals; best (2.5, 3.0), 0.25
        res = GridSearchOptimizer(
            GridSearchOptions(
                default_grid_steps=10, per_parameter_grid_steps={"x": 3, "y": 6}
            )
        ).optimize(
            lambda p: (p["x"] - 2.0) ** 2 + (p["y"] - 3.0) ** 2,
            [ParameterDefinition("x", 0.0, 5.0), ParameterDefinition("y", 0.0, 5.0)],
        )
        assert res.success
        assert abs(res.minimized_metric - 0.25) < 1e-9
        assert abs(res.best_parameters["x"] - 2.5) < 1e-4
        assert abs(res.best_parameters["y"] - 3.0) < 1e-4
        assert res.function_evaluations == 18

    def test_max_evaluations_limits_exactly(self):
        # :190-210 — 36-combo grid capped to exactly 10 evaluations
        res = GridSearchOptimizer(
            GridSearchOptions(default_grid_steps=6, max_function_evaluations=10)
        ).optimize(
            lambda p: (p["x"] - 2.0) ** 2 + (p["y"] - 3.0) ** 2,
            [ParameterDefinition("x", 0.0, 5.0), ParameterDefinition("y", 0.0, 5.0)],
        )
        assert res.success
        assert res.function_evaluations == 10
        assert "x" in res.best_parameters and "y" in res.best_parameters

    def test_early_stopping_under_full_grid(self):
        # :213-239 — threshold 0.1, target on a grid point -> stops < 36
        res = GridSearchOptimizer(
            GridSearchOptions(default_grid_steps=6, early_stopping_threshold=0.1)
        ).optimize(
            lambda p: (p["x"] - 2.0) ** 2 + (p["y"] - 2.0) ** 2,
            [ParameterDefinition("x", 0.0, 5.0), ParameterDefinition("y", 0.0, 5.0)],
        )
        assert res.success
        assert abs(res.minimized_metric) < 1e-9
        assert res.function_evaluations < 36

    def test_log_scale_improves_small_target(self):
        # :246-271 — log spacing beats linear for a 0.01 target in [0.001, 1]
        obj = lambda p: (p["x"] - 0.01) ** 2
        lin = GridSearchOptimizer(GridSearchOptions(default_grid_steps=5)).optimize(
            obj, [ParameterDefinition("x", 0.001, 1.0)]
        )
        log = GridSearchOptimizer(
            GridSearchOptions(
                default_grid_steps=5, use_logarithmic_scale_for={"x"}
            )
        ).optimize(obj, [ParameterDefinition("x", 0.001, 1.0)])
        assert log.minimized_metric < lin.minimized_metric
        assert abs(log.best_parameters["x"] - 0.01) < abs(
            lin.best_parameters["x"] - 0.01
        )

    def test_log_scale_invalid_bounds_falls_back_to_linear(self):
        # :274-292 — min=0 invalid for log: silently linear, best x=0
        res = GridSearchOptimizer(
            GridSearchOptions(default_grid_steps=5, use_logarithmic_scale_for={"x"})
        ).optimize(
            lambda p: (p["x"] - 0.01) ** 2, [ParameterDefinition("x", 0.0, 1.0)]
        )
        assert abs(res.best_parameters["x"]) < 1e-4
        assert abs(res.minimized_metric - 0.0001) < 1e-9

    def test_adaptive_refinement_exact_eval_count(self):
        # :297-324 — 6x6 coarse + 5x5 refinement = 61 evals, off-grid target hit
        res = GridSearchOptimizer(
            GridSearchOptions(
                default_grid_steps=6,
                enable_adaptive_refinement=True,
                refinement_range_factor=0.2,
                refinement_grid_steps=5,
                max_function_evaluations=100,
            )
        ).optimize(
            lambda p: (p["x"] - 2.25) ** 2 + (p["y"] - 3.25) ** 2,
            [ParameterDefinition("x", 0.0, 5.0), ParameterDefinition("y", 0.0, 5.0)],
        )
        assert res.success
        assert abs(res.minimized_metric) < 1e-9
        assert abs(res.best_parameters["x"] - 2.25) < 1e-4
        assert abs(res.best_parameters["y"] - 3.25) < 1e-4
        assert res.function_evaluations == 36 + 25

    def test_nan_objective_values_skipped(self):
        # ObjectiveFunctions.Quadratic1D_WithNaN semantics: NaN never wins
        def obj(p):
            return float("nan") if p["x"] < 2.0 else (p["x"] - 3.0) ** 2

        res = GridSearchOptimizer(GridSearchOptions(default_grid_steps=11)).optimize(
            obj, [ParameterDefinition("x", 0.0, 5.0)]
        )
        assert res.success
        assert abs(res.best_parameters["x"] - 3.0) < 1e-4


class TestNelderMeadReferenceParity:
    """Fixtures ported from NelderMeadOptimizerTests.cs."""

    def test_no_parameters_returns_failure_result(self):
        res = NelderMeadOptimizer().optimize(lambda p: 0.0, [])
        assert res.success is False
        assert res.message == "No parameters to optimize."
        assert math.isnan(res.minimized_metric)
        assert res.best_parameters == {}
        assert res.function_evaluations == 0

    def test_objective_throws_yields_inf(self):
        # OptimizeAsync_ObjectiveFunctionThrows_HandlesGracefully
        def boom(p):
            raise RuntimeError("Test exception from objective function.")

        res = NelderMeadOptimizer().optimize(
            boom, [ParameterDefinition("x", 0.0, 1.0, initial_guess=0.5)]
        )
        assert math.isinf(res.minimized_metric)
        assert res.function_evaluations > 0

    def test_nan_region_avoided(self):
        # OptimizeAsync_FunctionReturnsNaN_HandlesAndAvoidsNaN: target 2,
        # NaN for x < 0 — optimizer must converge inside the valid region
        def obj(p):
            x = p["x"]
            return float("nan") if x < 0 else (x - 2.0) ** 2

        res = NelderMeadOptimizer(
            NelderMeadOptions(
                function_value_convergence_tolerance=1e-7,
                parameter_convergence_tolerance=1e-4,
            )
        ).optimize(obj, [ParameterDefinition("x", -1.0, 3.0, initial_guess=0.5)])
        assert res.success, res.message
        # reference test tolerances (NelderMeadOptimizerTests.cs:12-13):
        # MetricTolerance 1e-2, ParamTolerance 1e-1 — a symmetric flat
        # simplex around the optimum legitimately converges at this scale
        assert abs(res.minimized_metric) <= 1e-2
        assert abs(res.best_parameters["x"] - 2.0) <= 1e-1
        assert res.best_parameters["x"] >= 0.0

    def test_zero_range_parameter_stays_fixed_and_warns(self):
        # OptimizeAsync_ParameterWithZeroRange_HandlesCorrectly
        res = NelderMeadOptimizer().optimize(
            lambda p: (p["x"] - 3.0) ** 2 + (p["y"] - 2.0) ** 2,
            [
                ParameterDefinition("x", -5.0, 5.0, initial_guess=0.0),
                ParameterDefinition("y", 2.0, 2.0, initial_guess=2.0),
            ],
        )
        assert res.success, res.message
        assert abs(res.minimized_metric) < 1e-6
        assert abs(res.best_parameters["x"] - 3.0) < 1e-3
        assert res.best_parameters["y"] == 2.0
        assert "y (at bound of zero-range definition)" in res.message

    def test_optimum_at_boundary_warns(self):
        # OptimizeAsync_OptimumAtBoundary_FindsAndWarns: target beyond max
        res = NelderMeadOptimizer().optimize(
            lambda p: (p["x"] - 10.0) ** 2,
            [ParameterDefinition("x", 0.0, 5.0, initial_guess=2.0)],
        )
        assert res.success
        assert abs(res.best_parameters["x"] - 5.0) < 0.05
        assert "near upper bound" in (res.message or "")


class TestCancellationAndAsync:
    """Async + cancellation surface (IParameterOptimizer.cs:50-55)."""

    def test_grid_timeout_returns_partial_best(self):
        import time as _time

        def slow_obj(p):
            _time.sleep(0.02)
            return (p["x"] - 2.0) ** 2

        res = GridSearchOptimizer(
            GridSearchOptions(default_grid_steps=500, timeout_s=0.1)
        ).optimize(slow_obj, [ParameterDefinition("x", 0.0, 5.0)])
        assert res.success is False
        assert "timed out" in (res.message or "")
        # partial best: some evaluations happened and the best-so-far
        # parameters are returned, not an empty dict
        assert 0 < res.function_evaluations < 500
        assert "x" in res.best_parameters

    def test_nm_timeout_returns_partial_best(self):
        import time as _time

        def slow_obj(p):
            _time.sleep(0.02)
            return (p["x"] - 2.0) ** 2 + (p["y"] + 1.0) ** 2

        res = NelderMeadOptimizer(
            NelderMeadOptions(max_iterations=100000, timeout_s=0.1,
                              function_value_convergence_tolerance=0.0,
                              enable_parameter_convergence=False,
                              stagnation_threshold_count=10**9)
        ).optimize(
            slow_obj,
            [
                ParameterDefinition("x", -5.0, 5.0, initial_guess=4.0),
                ParameterDefinition("y", -5.0, 5.0, initial_guess=4.0),
            ],
        )
        assert res.success is False
        assert "timed out" in (res.message or "")
        assert "x" in res.best_parameters

    def test_timeout_not_hit_keeps_success(self):
        res = GridSearchOptimizer(
            GridSearchOptions(default_grid_steps=11, timeout_s=30.0)
        ).optimize(
            lambda p: (p["x"] - 2.0) ** 2, [ParameterDefinition("x", 0.0, 5.0)]
        )
        assert res.success
        assert abs(res.best_parameters["x"] - 2.0) < 1e-6

    def test_grid_cancellation_midway(self):
        from signalsharp_ray.kernels.optimize import CancellationToken

        token = CancellationToken()
        count = 0

        def obj(p):
            nonlocal count
            count += 1
            if count >= 5:
                token.cancel()
            return (p["x"] - 2.0) ** 2

        res = GridSearchOptimizer(GridSearchOptions(default_grid_steps=50)).optimize(
            obj, [ParameterDefinition("x", 0.0, 5.0)], cancellation_token=token
        )
        assert res.success is False
        assert res.message == "Optimization was cancelled."
        assert res.function_evaluations < 50

    def test_nm_cancellation_midway(self):
        from signalsharp_ray.kernels.optimize import CancellationToken

        token = CancellationToken()
        count = 0

        def obj(p):
            nonlocal count
            count += 1
            if count > 20:
                token.cancel()
            return (p["x"] - 2.0) ** 2 + (p["y"] - 2.0) ** 2

        res = NelderMeadOptimizer(NelderMeadOptions(max_iterations=10000)).optimize(
            obj,
            [
                ParameterDefinition("x", 0.0, 5.0, initial_guess=1.0),
                ParameterDefinition("y", 0.0, 5.0, initial_guess=1.0),
            ],
            cancellation_token=token,
        )
        assert res.success is False
        assert res.message == "Optimization was cancelled."

    def test_optimize_async_runs(self):
        import asyncio

        res = asyncio.run(
            GridSearchOptimizer(GridSearchOptions(default_grid_steps=11)).optimize_async(
                lambda p: (p["x"] - 2.0) ** 2, [ParameterDefinition("x", 0.0, 5.0)]
            )
        )
        assert res.success
        assert abs(res.best_parameters["x"] - 2.0) < 1e-4

    def test_nm_optimize_async_runs(self):
        import asyncio

        res = asyncio.run(
            NelderMeadOptimizer().optimize_async(
                quadratic,
                [
                    ParameterDefinition("x", -10.0, 10.0, initial_guess=0.0),
                    ParameterDefinition("y", -10.0, 10.0, initial_guess=0.0),
                ],
            )
        )
        assert res.success
        assert abs(res.best_parameters["x"] - 3.0) < 1e-3


class TestReferenceBehaviorParity:
    """Behaviors from GridSearchOptimizerTests.cs / NelderMeadOptimizerTests.cs
    not covered above."""

    def test_refinement_skipped_when_budget_exhausted(self):
        # OptimizeAsync_AdaptiveRefinement_InsufficientBudget_SkipsRefinement
        calls = []

        def obj(p):
            calls.append(p["x"])
            return (p["x"] - 0.3) ** 2

        opts = GridSearchOptions(
            default_grid_steps=5,
            max_function_evaluations=5,
            enable_adaptive_refinement=True,
            refinement_grid_steps=5,
        )
        res = GridSearchOptimizer(opts).optimize(obj, [ParameterDefinition("x", 0, 1)])
        assert res.success
        assert len(calls) == 5  # first pass only; no refinement overrun
        assert res.function_evaluations == 5

    def test_refinement_never_worsens_when_already_optimal(self):
        # OptimizeAsync_AdaptiveRefinement_DoesNotImproveIfAlreadyOptimal:
        # grid point 0.5 IS the optimum; the refined pass must keep it
        def obj(p):
            return (p["x"] - 0.5) ** 2

        base = GridSearchOptions(default_grid_steps=5)
        refined = GridSearchOptions(
            default_grid_steps=5,
            enable_adaptive_refinement=True,
            refinement_grid_steps=5,
        )
        r0 = GridSearchOptimizer(base).optimize(obj, [ParameterDefinition("x", 0, 1)])
        r1 = GridSearchOptimizer(refined).optimize(obj, [ParameterDefinition("x", 0, 1)])
        assert r1.minimized_metric <= r0.minimized_metric
        assert abs(r1.best_parameters["x"] - 0.5) < 1e-9

    def test_grid_optimum_near_boundary_warns(self):
        # OptimizeAsync_OptimumNearBoundary_IncludesWarningInResult
        def obj(p):
            return (p["x"] - 0.995) ** 2  # distance 0.5% < the strict 1% cut

        res = GridSearchOptimizer(GridSearchOptions(default_grid_steps=201)).optimize(
            obj, [ParameterDefinition("x", 0, 1)]
        )
        assert res.success
        assert res.message is not None and "bound" in res.message.lower()

    def test_nm_max_iterations_stops(self):
        # OptimizeAsync_MaxIterations_StopsOptimization
        def obj(p):
            return (p["x"] - 0.123456) ** 2 + (p["y"] + 0.4) ** 2

        res = NelderMeadOptimizer(NelderMeadOptions(max_iterations=3)).optimize(
            obj,
            [ParameterDefinition("x", -1, 1), ParameterDefinition("y", -1, 1)],
        )
        assert res.success  # terminates with SOME finite best
        assert math.isfinite(res.minimized_metric)

    def test_nm_adaptive_parameters_converges(self):
        # OptimizeAsync_AdaptiveParameters_RunsSuccessfully — the adaptive
        # coefficient schedule still finds the quadratic minimum
        def obj(p):
            return sum((p[k] - 0.2 * (i + 1)) ** 2 for i, k in enumerate(sorted(p)))

        defs = [ParameterDefinition(f"p{i}", -2, 2) for i in range(6)]  # dims > 5
        res = NelderMeadOptimizer(
            NelderMeadOptions(enable_adaptive_parameters=True, max_iterations=2000)
        ).optimize(obj, defs)
        assert res.success
        assert res.minimized_metric < 1e-3

    def test_nm_adaptive_schedule_values(self):
        # the exact reference schedule (NelderMeadOptimizer.cs:687-722)
        o = NelderMeadOptions(enable_adaptive_parameters=True)
        refl, exp_, contr, shrink = o.algorithm_parameters(iteration=0, dims=6)
        assert refl == pytest.approx(1.1) and exp_ == pytest.approx(2.4)
        refl, exp_, contr, shrink = o.algorithm_parameters(iteration=60, dims=2)
        assert refl == pytest.approx(0.95)
        assert exp_ == pytest.approx(1.8)
        assert contr == pytest.approx(0.525)
        assert shrink == 0.5
        # disabled -> raw options
        o2 = NelderMeadOptions()
        assert o2.algorithm_parameters(60, 6) == (1.0, 2.0, 0.5, 0.5)
