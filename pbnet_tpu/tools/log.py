"""Logging + checkpoint/auto-resume (torch-free).

Same operational contract as /root/reference/tools/log.py:
* timestamped logfile under ``logpath/{train|result}/`` + console
* ``checkpoint_save``: one file per epoch named ``%09d.ckpt``; the previous
  epoch's file is pruned unless ``epoch % save_freq == 0`` (:104-116)
* ``checkpoint_restore``: explicit file or newest ``*.ckpt`` glob auto-resume,
  epoch parsed from the filename (:64-101)

Checkpoints serialize the flax variables + optimizer state with
``flax.serialization`` (msgpack) — the orbax-free path keeps restores free of
device-placement concerns (restores land on host, jit re-shards).
"""

from __future__ import annotations

import glob
import logging
import os
import pickle
import sys
import time

import flax.serialization


def create_logger(log_file: str) -> logging.Logger:
    logger = logging.getLogger("pbnet_tpu")
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s  %(message)s")
    fh = logging.FileHandler(log_file)
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    logger.propagate = False
    return logger


def get_logger(cfg) -> logging.Logger:
    sub = "train" if cfg.task == "train" else "result"
    log_dir = os.path.join(cfg.logpath, sub)
    os.makedirs(log_dir, exist_ok=True)
    log_file = os.path.join(
        log_dir, time.strftime("%Y%m%d_%H%M%S", time.localtime()) + ".log"
    )
    return create_logger(log_file)


def checkpoint_save(state: dict, logpath: str, epoch: int, save_freq: int = 16) -> str:
    """state: {'params': ..., 'batch_stats': ..., 'opt_state': ...}."""
    os.makedirs(logpath, exist_ok=True)
    fname = os.path.join(logpath, f"{epoch:09d}.ckpt")
    payload = {k: flax.serialization.to_bytes(v) for k, v in state.items()}
    with open(fname + ".tmp", "wb") as f:
        pickle.dump(payload, f)
    os.replace(fname + ".tmp", fname)  # atomic: no torn checkpoints on crash
    # prune previous epoch unless it's a keeper
    prev = epoch - 1
    if prev % save_freq != 0:
        prev_f = os.path.join(logpath, f"{prev:09d}.ckpt")
        if os.path.isfile(prev_f):
            os.remove(prev_f)
    return fname


def checkpoint_restore(template: dict, logpath: str, pretrain_file: str = ""):
    """Restore into the pytree structure of ``template``.

    Returns (state, start_epoch, restored_file); start_epoch = epoch+1 of the
    newest checkpoint, or 1 when nothing is found (the reference counts epochs
    from 1, tools/log.py:78-83).
    """
    fname = pretrain_file
    if not fname:
        cands = sorted(glob.glob(os.path.join(logpath, "*.ckpt")))
        fname = cands[-1] if cands else ""
    if not fname or not os.path.isfile(fname):
        return template, 1, ""
    with open(fname, "rb") as f:
        payload = pickle.load(f)
    state = {
        k: flax.serialization.from_bytes(template[k], payload[k])
        for k in template
        if k in payload
    }
    for k in template:
        state.setdefault(k, template[k])
    base = os.path.basename(fname)
    try:
        epoch = int(base.split(".")[0])
    except ValueError:
        epoch = 0
    return state, epoch + 1, fname


def print_error(message: str, user_fault: bool = False):
    sys.stderr.write("ERROR: " + str(message) + "\n")
    if user_fault:
        sys.exit(2)
    sys.exit(-1)
