"""One-off: per-fusion device profile of the U-Net train step (b8, train
defaults: lane_pad=0, softmax head), with HLO layer attribution.

Usage: python scripts/exp_profile_train.py   (TPU, serialized)
"""
import glob
import gzip
import json
import re
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.unet import DilatedUNet
    from adipose_tpu.ops import losses as L
    from adipose_tpu.train.state import TrainState, make_unet_train_step

    print("backend:", jax.devices())
    TILE, BATCH = 1024, 4
    model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16,
                        lane_pad=0, fast_head=False)
    params = model.init(key_for("bench.init"), jnp.zeros((1, TILE, TILE)))
    tx = optax.adam(1e-4)
    state = TrainState.create(params=params, tx=tx)

    def loss_fn(y_true, outputs):
        return L.weighted_bce_dice_loss(y_true, outputs)

    step = make_unet_train_step(model, loss_fn)

    rng = np.random.RandomState(865)
    imgs = jnp.asarray(rng.rand(BATCH, TILE, TILE).astype(np.float32))
    masks = jnp.asarray((rng.rand(BATCH, TILE, TILE) > 0.5).astype(np.float32))
    key = key_for("train.step")

    lowered = step.lower(state, imgs, masks, key)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    fusion_ops = {}
    cur = None
    for line in hlo.splitlines():
        if line.rstrip().endswith("{") and "(" in line:
            cur = line.strip().split()[0].lstrip("%")
            fusion_ops.setdefault(cur, [])
        elif cur is not None:
            s = line.strip()
            if "convolution(" in s:
                shape = re.search(r"=\s*(\S+)\s+convolution", s)
                win = re.search(r"window={([^}]*)}", s)
                op = re.search(r'op_name="([^"]*)"', s)
                layer = ""
                if op:
                    nm = op.group(1)
                    tag = "BWD" if ("transpose" in nm or "vjp" in nm
                                    or "backward" in nm) else ""
                    layer = tag + "/".join(
                        p for p in nm.split("/")
                        if "conv" in p.lower() or "output" in p
                        or "dilate" in p or "aux" in p)
                fusion_ops[cur].append(
                    f"conv out={shape.group(1) if shape else '?'} "
                    f"win=[{(win.group(1) if win else '')[:60]}] {layer[:70]}")
            if s == "}":
                cur = None

    callmap = {}
    for line in hlo.splitlines():
        s = line.strip()
        m = re.match(r"%?([\w.\-]+)\s*=\s*(\S+)\s+fusion\(.*calls=%?([\w.\-]+)", s)
        if m:
            callmap[m.group(1)] = (m.group(3), m.group(2))

    sfn = step
    for _ in range(2):
        state, metrics = sfn(state, imgs, masks, key)
        _ = float(metrics["loss"]) if isinstance(metrics, dict) else float(
            jax.tree_util.tree_leaves(metrics)[0])

    trace_dir = "/tmp/unet_train_trace"
    jax.profiler.start_trace(trace_dir)
    state, metrics = sfn(state, imgs, masks, key)
    _ = float(jax.tree_util.tree_leaves(metrics)[0])
    jax.profiler.stop_trace()
    time.sleep(1)

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    print("trace:", files[-1])
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    durs = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            durs[ev.get("name", "")] = durs.get(ev.get("name", ""), 0.0) \
                + ev["dur"] / 1e3
    total = 0.0
    for name, ms in sorted(durs.items(), key=lambda kv: -kv[1]):
        if name.startswith(("jit_", "Pjit", "$", "copy-start", "copy-done",
                            "PythonRefManager", "ParseArguments", "PJRT",
                            "np.asarray", "DevicePut")):
            continue
        total += ms
        if ms < 1.0:
            continue
        comp, _ = callmap.get(name, ("?", "?"))
        convs = fusion_ops.get(comp, [])
        print(f"{ms:8.2f} ms  {name:28s} {('; '.join(convs))[:150]}")
    print(f"TOTAL device ≈ {total:.1f} ms -> {BATCH / total * 1000:.1f} tiles/s")


if __name__ == "__main__":
    main()
