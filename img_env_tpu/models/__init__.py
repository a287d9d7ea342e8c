"""Policy / value networks for the crowd-navigation tasks."""

from img_env_tpu.models.policy import (
    CrowdNavPolicy,
    PolicyConfig,
    example_inputs,
    init_policy,
    sample_action,
)

__all__ = [
    "CrowdNavPolicy",
    "PolicyConfig",
    "example_inputs",
    "init_policy",
    "sample_action",
]
