"""Evaluation, recording, replay and rendering."""

from img_env_tpu.eval.recorder import EpisodeRecord, EpisodeRecorder, ScenarioBank
from img_env_tpu.eval.render import KELLY_COLORS, render_frame, render_tiles

__all__ = [
    "EpisodeRecord",
    "EpisodeRecorder",
    "ScenarioBank",
    "KELLY_COLORS",
    "render_frame",
    "render_tiles",
]
