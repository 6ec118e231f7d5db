#!/usr/bin/env python3
"""Process supervisor: launch + auto-restart the server fleet.

Role of supervisord (supervisord.conf:11-45: three servers under
autorestart=true, startretries=3): reads deploy/servers.yaml, spawns one
scripts/run_server.py per entry, restarts crashed children with bounded
retries, and propagates SIGTERM.
"""
from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))


def build_cmd(entry: dict):
    """Child argv + env. `device: K` pins the child to chip K two ways:
    TPU_VISIBLE_DEVICES so the TPU runtime claims ONLY that chip (one
    engine process per chip — the TPU analogue of supervisord's three
    CPU servers, supervisord.conf:11-45), plus --device for backends
    where visibility masking is unavailable (CPU test meshes)."""
    cmd = [sys.executable, os.path.join(HERE, "run_server.py"),
           "--port", str(entry["port"])]
    if entry.get("demo"):
        cmd.append("--demo")
    if entry.get("model_dir"):
        cmd += ["--model-dir", entry["model_dir"]]
    if entry.get("online_model_dir"):
        cmd += ["--online-model-dir", entry["online_model_dir"]]
    if entry.get("vad_dir"):
        cmd += ["--vad-dir", entry["vad_dir"]]
    if entry.get("punc_dir"):
        cmd += ["--punc-dir", entry["punc_dir"]]
    if entry.get("itn"):
        cmd.append("--itn")
    if entry.get("decode_workers"):
        cmd += ["--decode-workers", str(entry["decode_workers"])]
    if entry.get("engine"):
        cmd.append("--engine")
    if entry.get("engine_capacity"):
        cmd += ["--engine-capacity", str(entry["engine_capacity"])]
    if entry.get("upload_overlap"):
        cmd.append("--upload-overlap")
    if entry.get("decide_async"):
        cmd.append("--decide-async")
    if entry.get("svs_dir"):
        cmd += ["--svs-dir", entry["svs_dir"]]
    if entry.get("svs_beam"):
        cmd += ["--svs-beam", str(entry["svs_beam"])]
    if entry.get("lm_dir"):
        cmd += ["--lm-dir", entry["lm_dir"]]
    if entry.get("hotword_file"):
        cmd += ["--hotword-file", entry["hotword_file"]]
    if entry.get("itn_dir"):
        cmd += ["--itn-dir", entry["itn_dir"]]
    if entry.get("tp_devices"):
        cmd += ["--tp-devices", str(entry["tp_devices"])]
    if entry.get("sp_devices"):
        cmd += ["--sp-devices", str(entry["sp_devices"])]
    if entry.get("cpu"):
        cmd.append("--cpu")
    env = dict(os.environ)
    if "device" in entry:
        dev = str(entry["device"])
        env["TPU_VISIBLE_DEVICES"] = dev
        env["CUDA_VISIBLE_DEVICES"] = dev
        cmd += ["--device", dev]
    return cmd, env


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="deploy/servers.yaml")
    args = p.parse_args()
    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    retries_max = cfg.get("restart", {}).get("startretries", 3)
    autorestart = cfg.get("restart", {}).get("autorestart", True)
    procs = {}
    retries = {}
    running = True

    def shutdown(signum, frame):
        nonlocal running
        running = False
        for name, proc in procs.items():
            if proc.poll() is None:
                proc.terminate()

    signal.signal(signal.SIGTERM, shutdown)
    signal.signal(signal.SIGINT, shutdown)

    for entry in cfg["servers"]:
        cmd, env = build_cmd(entry)
        procs[entry["name"]] = subprocess.Popen(cmd, env=env)
        retries[entry["name"]] = 0
        print(f"started {entry['name']} on port {entry['port']} "
              f"(pid {procs[entry['name']].pid})")

    while running:
        time.sleep(2)
        for entry in cfg["servers"]:
            name = entry["name"]
            proc = procs[name]
            if proc.poll() is not None and running:
                if not autorestart or retries[name] >= retries_max:
                    print(f"{name} exited rc={proc.returncode}; giving up")
                    continue
                retries[name] += 1
                print(f"{name} exited rc={proc.returncode}; restart "
                      f"{retries[name]}/{retries_max}")
                cmd, env = build_cmd(entry)
                procs[name] = subprocess.Popen(cmd, env=env)
    for proc in procs.values():
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
    return 0


if __name__ == "__main__":
    sys.exit(main())
