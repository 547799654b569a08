"""Experiment management — CLI flags, experiment ids, log-dir layout, resume.

The working equivalent of the reference's cfg_helper entry machinery:
get_command_line_args (cfg_helper.py:335-423), experiment-id minting from
wall clock (:309-324), log-dir layout + config archiving (:425-640), resume
cfg reconstruction (:354-369). Multi-node rank/env flags are replaced by the
single-controller JAX model (see parallel/distributed.py).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time


def get_experiment_id(ref_time=None) -> str:
    """Wall-clock-derived unique id (cfg_helper.py:309-324 semantics)."""
    return time.strftime("%Y%m%d%H%M%S", time.localtime(ref_time))


def get_command_line_args(argv=None):
    p = argparse.ArgumentParser("pfd_tpu")
    p.add_argument("--config", type=str, help="named config (pfd_tpu.config bank)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--pretrained_root", type=str, default=None)
    p.add_argument("--log_dir", type=str, default="log")
    p.add_argument("--resume_dir", type=str, default=None)
    p.add_argument("--resume_step", type=int, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--grad_acc", type=int, default=1)
    p.add_argument("--tp", type=int, default=1, help="model-parallel degree")
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host coordinator address")
    return p.parse_args(argv)


def init_experiment(args, cfg: dict | None = None) -> dict:
    """Mint an experiment dir, archive the resolved config, snapshot code.
    Returns {'expid', 'log_dir', 'ckpt_dir'}. On resume, reuses the saved dir
    and config (cfg_helper.py:445-470 semantics)."""
    if args.resume_dir:
        log_dir = args.resume_dir
        with open(os.path.join(log_dir, "config.json")) as f:
            saved = json.load(f)
        expid = saved.get("expid", os.path.basename(log_dir))
    else:
        expid = get_experiment_id()
        name = (args.config or "exp")
        log_dir = os.path.join(args.log_dir, f"{expid}-{name}")
        os.makedirs(log_dir, exist_ok=True)
        with open(os.path.join(log_dir, "config.json"), "w") as f:
            json.dump({"expid": expid, "args": vars(args), "cfg": cfg}, f,
                      indent=2, default=str)
        _snapshot_code(log_dir)
    ckpt_dir = os.path.join(log_dir, "weight")
    os.makedirs(ckpt_dir, exist_ok=True)
    return {"expid": expid, "log_dir": log_dir, "ckpt_dir": ckpt_dir}


def _snapshot_code(log_dir):
    """Archive the pfd_tpu source into the log dir (cfg_helper.py:608-628)."""
    import pfd_tpu

    src = os.path.dirname(pfd_tpu.__file__)
    dst = os.path.join(log_dir, "code", "pfd_tpu")
    if not os.path.exists(dst):
        shutil.copytree(src, dst,
                        ignore=shutil.ignore_patterns("__pycache__", "*.pyc"))
