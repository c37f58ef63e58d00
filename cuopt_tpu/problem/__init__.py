from cuopt_tpu.problem.data_model import DataModel, OptimizationProblem

__all__ = ["DataModel", "OptimizationProblem"]
