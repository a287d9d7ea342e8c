"""Sampling and gradient MPC over the differentiable navigation dynamics."""

from img_env_tpu.mpc.controller import MpcController, MpcState
from img_env_tpu.mpc.cost import CostWeights, WorldCost
from img_env_tpu.mpc.edt import edt2d, edt2d_device
from img_env_tpu.mpc.ilqr import IlqrConfig, batched_ilqr, ilqr_solve, smooth_step
from img_env_tpu.mpc.lqr import LqtProblem, lqt_backward_assoc, lqt_backward_seq
from img_env_tpu.mpc.mppi import MppiConfig, PlannerState, batched_mppi, cem_plan, mppi_plan
from img_env_tpu.mpc.prediction import predict_peds

__all__ = [
    "IlqrConfig",
    "batched_ilqr",
    "ilqr_solve",
    "smooth_step",
    "LqtProblem",
    "lqt_backward_assoc",
    "lqt_backward_seq",
    "MpcController",
    "MpcState",
    "CostWeights",
    "WorldCost",
    "edt2d",
    "edt2d_device",
    "MppiConfig",
    "PlannerState",
    "batched_mppi",
    "cem_plan",
    "mppi_plan",
]
