"""Model checkpoint: config travels with weights, versioned.

Re-derivation of the reference's checkpoint layout semantics
(reference: calamari_ocr/ocr/savedmodel/saved_model.py:14-49 — a
`<name>.ckpt.json` holding every param incl. the codec and processor
chain next to the weights, with a VERSION field and auto-migration at
load, saved_model.py:51-116). Spark deployment: the checkpoint directory
ships via ``spark-submit --files``/`SparkFiles`; executors call
``load_checkpoint`` once per Python worker.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

VERSION = 1


@dataclass
class Checkpoint:
    codec_charset: List[str]
    network_spec: str
    line_height: int = 48
    pad: int = 16
    text_postproc: List[str] = field(default_factory=lambda: ["quotes", "spaces"])
    version: int = VERSION
    weights: Optional[dict] = None  # name -> ndarray

    def save(self, ckpt_dir: str) -> None:
        os.makedirs(ckpt_dir, exist_ok=True)
        cfg = {
            "version": self.version,
            "codec": {"charset": self.codec_charset},
            "network": self.network_spec,
            "line_height": self.line_height,
            "pad": self.pad,
            "text_postproc": self.text_postproc,
        }
        with open(os.path.join(ckpt_dir, "ckpt.json"), "w") as f:
            json.dump(cfg, f, ensure_ascii=False, indent=1)
        if self.weights is not None:
            np.savez_compressed(os.path.join(ckpt_dir, "weights.npz"), **self.weights)


def _migrate(cfg: dict) -> dict:
    """Version upgrades land here (reference: saved_model.py:51-116 chains
    one upgrade per version). Version 0 (pre-release) lacked text_postproc."""
    v = cfg.get("version", 0)
    if v == 0:
        cfg.setdefault("text_postproc", ["quotes", "spaces"])
        cfg["version"] = 1
    if cfg["version"] != VERSION:
        raise ValueError(f"cannot migrate checkpoint version {v} -> {VERSION}")
    return cfg


def load_checkpoint(ckpt_dir: str) -> Checkpoint:
    with open(os.path.join(ckpt_dir, "ckpt.json")) as f:
        cfg = _migrate(json.load(f))
    weights = None
    wpath = os.path.join(ckpt_dir, "weights.npz")
    if os.path.exists(wpath):
        z = np.load(wpath)
        weights = {k: z[k] for k in z.files}
    return Checkpoint(
        codec_charset=cfg["codec"]["charset"],
        network_spec=cfg["network"],
        line_height=cfg["line_height"],
        pad=cfg["pad"],
        text_postproc=cfg["text_postproc"],
        version=cfg["version"],
        weights=weights,
    )
