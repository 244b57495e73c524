"""Per-op device-time breakdown of the serving step (VERDICT r2 #8).

Runs the bench serving workload (full-size model, B=32, valid-filelist
phonemes, bf16-on-TPU) under a jax.profiler trace and prints device-side op
durations grouped by fusion/kernel name, so the "31% XLA residue" from the
round-2 profile is attributable line by line.

    python scripts/profile_serving.py [--out /tmp/fs2_profile] [--reps 8]

Wall timing over the axon tunnel is dispatch-noise; this reads the trace's
device-track events (the same methodology PARITY.md's round-2 numbers used).
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_workload():
    from fastspeech2_tpu.config import Config
    from fastspeech2_tpu.data.filelist import parse_filelist
    from fastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from fastspeech2_tpu.ops.precision import compute_dtype
    from fastspeech2_tpu.text import phonemes_to_sequence

    cfg = Config()
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    params["duration_predictor"]["out"]["b"] = (
        jnp.full_like(params["duration_predictor"]["out"]["b"], 1.87))
    entries = parse_filelist("/root/reference/filelists/valid_filelist.txt")
    seqs = [np.asarray(phonemes_to_sequence(e.phonemes), np.int32)
            for e in entries]
    B, T, L = 32, 128, 896
    xs = np.zeros((B, T), np.int32)
    ilens = np.zeros((B,), np.int32)
    for i in range(B):
        s = seqs[i % len(seqs)][:T]
        xs[i, : len(s)] = s
        ilens[i] = len(s)
    bf16 = jax.default_backend() == "tpu"

    @jax.jit
    def infer(params, state, xs, ilens):
        with compute_dtype(jnp.bfloat16 if bf16 else None):
            mel, out_lens, _ = model.inference(params, state, xs, ilens,
                                               out_maxlen=L)
        return mel, out_lens

    return infer, (params, state, jnp.asarray(xs), jnp.asarray(ilens))


#: trace noise that is scheduling/bookkeeping, not op execution
_NON_OPS = ("ThreadpoolListener", "SlinkyThreadPool", "ThunkExecutor",
            "end: ", "PjRt", "PjitFunction", "ParseArguments",
            "PythonRefManager", "CollectGarbage")


def device_op_table(trace_dir):
    """Parse the perfetto trace: sum complete-event durations per op name on
    device/XLA-executor tracks. Returns {name: (total_us, count)}.

    TPU: op events live on a '/device:TPU:N' process ('XLA Ops' threads).
    CPU: they live on the host process's 'tf_XLA*' executor threads."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    table = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pnames.get(e.get("pid"), "")
        tname = tnames.get((e.get("pid"), e.get("tid")), "")
        on_device = "TPU" in pname or "/device:" in pname
        on_xla_exec = tname.startswith("tf_XLA") or "XLA Ops" in tname
        if not (on_device or on_xla_exec):
            continue
        name = e.get("name", "?")
        if any(name.startswith(t) or t in name for t in _NON_OPS):
            continue
        if name.startswith("jit_") and name.endswith(")"):
            # module-level region spanning all child ops -- counting it would
            # double the total (it IS the per-call device time, not an op)
            continue
        table[name][0] += e["dur"]
        table[name][1] += 1
    return {k: (v[0], v[1]) for k, v in table.items()}


def classify(name: str) -> str:
    n = name.lower()
    if (n.startswith("fused_") or "custom-call" in n or "pallas" in n
            or "tpu_custom_call" in n):
        return "pallas kernel"  # our kernels are traced by their fused_* name
    if "conv" in n.replace("convert", ""):
        return "xla conv"
    if "fusion" in n:
        return "xla fusion"
    if "dot" in n or "gemm" in n:
        return "xla dot"
    if any(t in n for t in ("copy", "transpose", "bitcast", "reshape")):
        return "layout"
    if any(t in n for t in ("sort", "scatter", "gather", "iota", "cumsum")):
        return "gather/sort"
    return "other"


def attribute_fusions(compiled_text, names):
    """Map trace op names (fusion.N, add_convert_fusion.K, ...) to source,
    from the optimized HLO's per-instruction metadata (op_name +
    source_file:line of the fusion root)."""
    import re

    attr = {}
    for m in re.finditer(
            r"%?([\w.-]+) = (\S+)[^\n]*? fusion\([^\n]*?"
            r'metadata=\{op_name="([^"]*)"'
            r'(?: source_file="([^"]*)" source_line=(\d+))?',
            compiled_text):
        name, shape, op_name, sfile, sline = m.groups()
        src = f"  {os.path.basename(sfile)}:{sline}" if sfile else ""
        attr[name] = f"{shape.split('{')[0]:22s} {op_name}{src}"
    return {n: attr.get(n, "?") for n in names}


def build_train_workload():
    """The bench training step (B=16, T=128, L=896, bf16) as a profilable
    (fn, args) pair; steps chain through the returned TrainState."""
    from fastspeech2_tpu.config import Config
    from fastspeech2_tpu.models.fastspeech2 import Batch, FastSpeech2
    from fastspeech2_tpu.train.optimizer import make_optimizer
    from fastspeech2_tpu.train.step import TrainState, make_train_step

    cfg = Config()
    bf16 = jax.default_backend() == "tpu"
    model = FastSpeech2(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    optimizer = make_optimizer(cfg)
    ts = TrainState(params, state, optimizer.init(params), jnp.int32(0))

    B, T, L = 16, 128, 896
    g = np.random.default_rng(0)
    batch = Batch(
        xs=jnp.asarray(g.integers(1, 68, (B, T)).astype(np.int32)),
        ilens=jnp.full((B,), T, jnp.int32),
        ys=jnp.asarray(g.normal(size=(B, L, 80)).astype(np.float32)),
        olens=jnp.full((B,), L, jnp.int32),
        ds=jnp.full((B, T), L // T, jnp.int32),
        es=jnp.asarray(g.uniform(0.0, 130.0, (B, L)).astype(np.float32)),
        ps=jnp.asarray(g.uniform(71.0, 676.0, (B, L)).astype(np.float32)))
    step_fn = jax.jit(make_train_step(model, optimizer, accum_grad=1,
                                      bf16=bf16))
    return step_fn, ts, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/fs2_profile")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--train", action="store_true",
                    help="profile the bench train step instead of serving")
    ap.add_argument("--hlo", action="store_true",
                    help="attribute top XLA fusions via the optimized HLO")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if args.train:
        step_fn, ts, batch = build_train_workload()
        rngs = jax.random.split(jax.random.PRNGKey(1), args.reps + 1)
        ts, report = step_fn(ts, batch, rngs[0])  # compile + warmup
        float(np.asarray(report["loss"]))
        with jax.profiler.trace(args.out):
            for i in range(args.reps):
                ts, report = step_fn(ts, batch, rngs[i + 1])
            float(np.asarray(report["loss"]))
        infer, wargs = None, None
    else:
        infer, wargs = build_workload()
        mel, out_lens = infer(*wargs)  # compile + warmup
        np.asarray(out_lens)
        with jax.profiler.trace(args.out):
            for _ in range(args.reps):
                mel, out_lens = infer(*wargs)
            np.asarray(out_lens)  # force: serialize the chain into the trace

    time.sleep(1.0)  # trace writer flush
    table = device_op_table(args.out)
    total = sum(us for us, _ in table.values())
    rows = sorted(table.items(), key=lambda kv: -kv[1][0])[: args.top]
    print(f"\ndevice total {total / args.reps / 1000.0:.3f} ms/call over "
          f"{args.reps} reps ({len(table)} distinct ops)\n")
    print(f"{'us/call':>9}  {'%':>5}  {'n':>4}  class          name")
    for name, (us, cnt) in rows:
        print(f"{us / args.reps:9.1f}  {100 * us / total:5.1f}  "
              f"{cnt // args.reps:4d}  {classify(name):13s}  {name[:90]}")
    by_class = defaultdict(float)
    for name, (us, _) in table.items():
        by_class[classify(name)] += us
    print("\nby class:")
    for cls, us in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"  {cls:14s} {us / args.reps:9.1f} us/call  "
              f"{100 * us / total:5.1f}%")

    if args.hlo and infer is not None:
        text = infer.lower(*wargs).compile().as_text()
        xla_rows = [n for n, _ in rows if classify(n).startswith("xla")]
        attr = attribute_fusions(text, xla_rows)
        print("\nfusion attribution (optimized HLO):")
        for name in xla_rows:
            print(f"  {name:24s} {attr[name][:110]}")


if __name__ == "__main__":
    main()
