"""Segment cost functions for PELT.

Each cost function implements the same surface as the reference's
IPELTCostFunction / ILikelihoodCostFunction
(/root/reference/SignalSharp/CostFunctions/Cost/IPELTCostFunction.cs:11-46,
ILikelihoodCostFunction.cs:9-51):

    fit(signal)                      # signal: (n,) or (dims, n) float64
    compute_cost(start, end)         # [start, end) half-open
    compute_likelihood_metric(s, e)  # likelihood-based costs only
    segment_parameter_count(length)
    supports_information_criteria

Registered by name so pipeline configs stay declarative.
"""

from .base import CostFunction, LikelihoodCostFunction
from .l2 import L2Cost
from .l1 import L1Cost
from .rbf import RBFCost
from .gaussian import GaussianLikelihoodCost
from .poisson import PoissonLikelihoodCost
from .bernoulli import BernoulliLikelihoodCost
from .binomial import BinomialLikelihoodCost
from .ar import ARCost

COST_REGISTRY = {
    "l2": L2Cost,
    "l1": L1Cost,
    "rbf": RBFCost,
    "gaussian": GaussianLikelihoodCost,
    "poisson": PoissonLikelihoodCost,
    "bernoulli": BernoulliLikelihoodCost,
    "binomial": BinomialLikelihoodCost,
    "ar": ARCost,
}


def make_cost(name: str, **kwargs) -> CostFunction:
    try:
        cls = COST_REGISTRY[name]
    except KeyError:
        raise ValueError(f"Unknown cost function {name!r}; known: {sorted(COST_REGISTRY)}")
    return cls(**kwargs)


__all__ = [
    "CostFunction",
    "LikelihoodCostFunction",
    "L2Cost",
    "L1Cost",
    "RBFCost",
    "GaussianLikelihoodCost",
    "PoissonLikelihoodCost",
    "BernoulliLikelihoodCost",
    "BinomialLikelihoodCost",
    "ARCost",
    "COST_REGISTRY",
    "make_cost",
]
