"""One-off: per-fusion device profile of the current inference program,
with fusion -> conv-shape mapping pulled from the compiled HLO.

Usage: python scripts/exp_profile_forward.py   (TPU, serialized)
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

    from adipose_tpu.core.seeding import key_for
    from adipose_tpu.models.unet import DilatedUNet

    print("backend:", jax.devices())
    TILE, BATCH = 1024, 16
    model = DilatedUNet(init_nb=44, compute_dtype=jnp.bfloat16)
    params = model.init(key_for("bench.init"), jnp.zeros((1, TILE, TILE)))
    mean, std = jnp.float32(200.99), jnp.float32(25.26)

    @jax.jit
    def predict(params, tiles_u8):
        x = (tiles_u8.astype(jnp.float32) - mean) / (std + 1e-10)
        return model.apply(params, x, train=False)

    rng = np.random.RandomState(865)
    batch = jnp.asarray((rng.rand(BATCH, TILE, TILE) * 255).astype(np.uint8))

    compiled = predict.lower(params, batch).compile()
    hlo = compiled.as_text()

    # map fusion name -> list of notable ops inside it (convs w/ shapes)
    fusion_ops = {}
    cur = None
    for line in hlo.splitlines():
        if line.rstrip().endswith("{") and "(" in line:
            cur = line.strip().split()[0].lstrip("%")
            fusion_ops.setdefault(cur, [])
        elif cur is not None:
            s = line.strip()
            if " convolution(" in s or s.startswith("convolution") or "convolution(" in s:
                shape = re.search(r"=\s*(\S+)\s+convolution", s)
                win = re.search(r"window={([^}]*)}", s)
                op = re.search(r'op_name="([^"]*)"', s)
                layer = ""
                if op:
                    layer = "/".join(
                        p for p in op.group(1).split("/")
                        if "conv" in p or "Conv" in p or "output" in p
                        or "dilate" in p or "aux" in p)
                fusion_ops[cur].append(
                    f"conv out={shape.group(1) if shape else '?'} "
                    f"win=[{win.group(1) if win else ''}] {layer}")
            if s == "}":
                cur = None

    # which top-level instructions call which fusion computation
    callmap = {}  # instr name -> (computation called, out shape)
    for line in hlo.splitlines():
        s = line.strip()
        m = re.match(r"%?([\w.\-]+)\s*=\s*(\S+)\s+fusion\(.*calls=%?([\w.\-]+)", s)
        if m:
            callmap[m.group(1)] = (m.group(3), m.group(2))
        m2 = re.match(r"%?([\w.\-]+)\s*=\s*(\S+)\s+convolution\(", s)
        if m2:
            callmap[m2.group(1)] = ("<bare conv>", m2.group(2))

    for b in range(2):
        out = predict(params, batch)
        _ = float(out[0, 0, 0])

    trace_dir = "/tmp/unet_trace_now"
    jax.profiler.start_trace(trace_dir)
    out = predict(params, batch)
    _ = float(out[0, 0, 0])
    jax.profiler.stop_trace()
    time.sleep(1)

    files = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))
    print("trace:", files[-1])
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    durs = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "")
            args = ev.get("args") or {}
            if "run_id" in args or "device" in str(ev.get("pid", "")).lower():
                pass
            durs[name] = durs.get(name, 0.0) + ev["dur"] / 1e3

    total = 0.0
    rows = sorted(durs.items(), key=lambda kv: -kv[1])
    for name, ms in rows:
        if name.startswith(("jit_", "Pjit", "$", "copy-start", "copy-done",
                            "PythonRefManager", "ParseArguments", "PJRT")):
            continue
        total += ms
        if ms < 0.3:
            continue
        comp, oshape = callmap.get(name, ("?", "?"))
        convs = fusion_ops.get(comp, [])
        desc = ("; ".join(convs) if convs else f"-> {oshape}")
        print(f"{ms:8.2f} ms  {name:32s} {desc[:130]}")
    print(f"TOTAL device ≈ {total:.1f} ms")


if __name__ == "__main__":
    main()
