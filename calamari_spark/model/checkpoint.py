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

VERSION = 2


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
            "network_spec": self.network_spec,
            "line_height": self.line_height,
            "pad": self.pad,
            "text_postproc": self.text_postproc,
        }
        with open(os.path.join(ckpt_dir, "ckpt.json"), "w") as f:
            json.dump(cfg, f, ensure_ascii=False, indent=1)
        if self.weights is not None:
            np.savez_compressed(os.path.join(ckpt_dir, "weights.npz"), **self.weights)


def _migrate(cfg: dict) -> dict:
    """Version upgrade CHAIN — one step per version, applied in sequence
    exactly like the reference's update_checkpoint loop (reference:
    saved_model.py:51-116, VERSION 2..6 each with an upgrade hop).

    v0 -> v1: pre-release configs lacked text_postproc (default chain).
    v1 -> v2: the 'network' key renamed to 'network_spec' (matches the
    dataclass field; the reference's v2->v3 hop was likewise a params
    rename wave)."""
    v = cfg.get("version", 0)
    if v == 0:
        cfg.setdefault("text_postproc", ["quotes", "spaces"])
        cfg["version"] = 1
    if cfg["version"] == 1:
        network = cfg.pop("network", None)
        if network is None:
            # match the error contract of the version check below rather
            # than surfacing a bare KeyError on a malformed v1 config
            raise ValueError(
                "cannot migrate checkpoint version 1 -> 2: "
                "v1 config is missing the 'network' key"
            )
        cfg["network_spec"] = network
        cfg["version"] = 2
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
        network_spec=cfg["network_spec"],
        line_height=cfg["line_height"],
        pad=cfg["pad"],
        text_postproc=cfg["text_postproc"],
        version=cfg["version"],
        weights=weights,
    )
