"""PDLP hyper-parameters and solver-mode presets.

Value parity with the reference hyper-parameter namespace
(cpp/src/linear_programming/pdlp_hyper_params.cu:24-84) and the four
solver-mode presets Stable1/Stable2/Methodical1/Fast1
(cpp/src/linear_programming/solve.cu:64-215). Stable2 is the default mode
(reference solver_settings.hpp:46-51).

These are static (hashable) so preset changes retrace the jitted solver —
there are only four presets, matching the reference's __constant__ device
symbols being set once per solve.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from cuopt_tpu.constants import (
    CUOPT_PDLP_SOLVER_MODE_FAST1,
    CUOPT_PDLP_SOLVER_MODE_METHODICAL1,
    CUOPT_PDLP_SOLVER_MODE_STABLE1,
    CUOPT_PDLP_SOLVER_MODE_STABLE2,
)

RESTART_NONE = 0
RESTART_KKT = 1
RESTART_TRUST_REGION = 2


@dataclass(frozen=True)
class PdlpHyperParams:
    initial_step_size_scaling: float = 1.0
    l_inf_ruiz_iterations: int = 10
    do_pock_chambolle_scaling: bool = True
    do_ruiz_scaling: bool = True
    alpha_pock_chambolle: float = 1.0
    artificial_restart_threshold: float = 0.36
    compute_initial_step_size_before_scaling: bool = False
    compute_initial_primal_weight_before_scaling: bool = False
    initial_primal_weight_c_scaling: float = 1.0
    initial_primal_weight_b_scaling: float = 1.0
    major_iteration: int = 40
    min_iteration_restart: int = 10
    restart_strategy: int = RESTART_KKT
    never_restart_to_average: bool = False
    reduction_exponent: float = 0.3
    growth_exponent: float = 0.6
    primal_weight_update_smoothing: float = 0.5
    sufficient_reduction_for_restart: float = 0.2
    necessary_reduction_for_restart: float = 0.8
    primal_importance: float = 1.0
    primal_distance_smoothing: float = 0.5
    dual_distance_smoothing: float = 0.5
    compute_last_restart_before_new_primal_weight: bool = True
    artificial_restart_in_main_loop: bool = False
    rescale_for_restart: bool = True
    update_primal_weight_on_initial_solution: bool = False
    update_step_size_on_initial_solution: bool = False
    handle_primal_gradients_on_finite_bounds_as_residuals: bool = False
    project_initial_primal: bool = True


STABLE2 = PdlpHyperParams()

STABLE1 = replace(
    STABLE2,
    initial_step_size_scaling=1.6,
    l_inf_ruiz_iterations=1,
    alpha_pock_chambolle=1.3,
    artificial_restart_threshold=0.5,
    compute_initial_primal_weight_before_scaling=True,
    initial_primal_weight_c_scaling=2.2,
    initial_primal_weight_b_scaling=4.6,
    major_iteration=52,
    min_iteration_restart=0,
    reduction_exponent=0.5,
    growth_exponent=0.9,
    primal_weight_update_smoothing=0.3,
    necessary_reduction_for_restart=0.5,
    primal_importance=1.8,
    primal_distance_smoothing=0.6,
    dual_distance_smoothing=0.2,
    compute_last_restart_before_new_primal_weight=False,
    rescale_for_restart=False,
    handle_primal_gradients_on_finite_bounds_as_residuals=True,
    project_initial_primal=False,
)

METHODICAL1 = replace(
    STABLE2,
    l_inf_ruiz_iterations=5,
    artificial_restart_threshold=0.5,
    major_iteration=64,
    min_iteration_restart=0,
    restart_strategy=RESTART_TRUST_REGION,
    sufficient_reduction_for_restart=0.1,
    necessary_reduction_for_restart=0.9,
    rescale_for_restart=False,
    handle_primal_gradients_on_finite_bounds_as_residuals=True,
    project_initial_primal=False,
)

FAST1 = replace(
    STABLE2,
    initial_step_size_scaling=0.8,
    l_inf_ruiz_iterations=6,
    do_ruiz_scaling=False,
    alpha_pock_chambolle=2.0,
    artificial_restart_threshold=0.3,
    compute_initial_primal_weight_before_scaling=True,
    initial_primal_weight_c_scaling=1.2,
    initial_primal_weight_b_scaling=1.2,
    major_iteration=76,
    min_iteration_restart=6,
    never_restart_to_average=True,
    reduction_exponent=0.4,
    sufficient_reduction_for_restart=0.3,
    necessary_reduction_for_restart=0.9,
    primal_importance=0.8,
    primal_distance_smoothing=0.8,
    dual_distance_smoothing=0.3,
    artificial_restart_in_main_loop=True,
    rescale_for_restart=True,
    handle_primal_gradients_on_finite_bounds_as_residuals=True,
    project_initial_primal=False,
)

PRESETS = {
    CUOPT_PDLP_SOLVER_MODE_STABLE1: STABLE1,
    CUOPT_PDLP_SOLVER_MODE_STABLE2: STABLE2,
    CUOPT_PDLP_SOLVER_MODE_METHODICAL1: METHODICAL1,
    CUOPT_PDLP_SOLVER_MODE_FAST1: FAST1,
}
