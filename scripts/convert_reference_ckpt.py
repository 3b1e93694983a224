"""Convert reference Keras/PhiFlow artifacts to this framework's formats.

The reference stores trained models as Keras HDF5 (`model.h5`,
/root/reference/karman-2d/karman_train.py:517, loaded by
karman_apply.py:127-129) and normalization stats as pickles
(`dataStats.pickle`, karman_train.py:359; `stats.pickle`,
karman_train_pre.py:221). Anyone holding original checkpoints can convert
them and run this framework's apply CLIs for cross-validation:

    python scripts/convert_reference_ckpt.py --h5 model.h5 --arch mars_moon \
        --out tf/model.msgpack \
        [--stats dataStats.pickle --stats-out tf/dataStats.json]
        [--pre-stats stats.pickle --pre-stats-out tf/stats.json]

Weight mapping: Keras auto-names Conv2D layers with a global creation
counter (conv2d, conv2d_1, ...), so sorting h5 conv layers by that suffix
recovers *creation* order even when `model.layers` traversal order differs
(the jupiter_moon 1x1 projections are created after their block's conv
pair, burgers_train_pre.py:354-366). Our flax modules construct their Conv
submodules in the same creation order (models/networks.py), giving a 1:1
ordered correspondence; every tensor is shape-checked on assignment.
Kernels are HWIO in both (Keras Conv2D == flax nn.Conv), so no transposes.

Reads h5 via h5py only — no TensorFlow dependency (the round-trip test in
tests/test_keras_import.py builds a real Keras model when TF is available).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_h5_convs(path):
    """[(name, kernel, bias)] for every conv layer, in Keras creation order."""
    import h5py

    out = []
    with h5py.File(path, "r") as f:
        g = f["model_weights"] if "model_weights" in f else f
        names = [n.decode() if isinstance(n, bytes) else n
                 for n in g.attrs.get("layer_names", list(g.keys()))]
        for name in names:
            base = re.fullmatch(r"(conv2d)(?:_(\d+))?", name)
            if base is None:
                continue
            idx = int(base.group(2) or 0)
            lg = g[name]
            # weights live under <layer>/<layer>/{kernel,bias}:0 (tf1-era) or
            # directly under the layer group
            while len(lg.keys()) == 1 and not hasattr(
                    lg[next(iter(lg.keys()))], "shape"):
                lg = lg[next(iter(lg.keys()))]
            kernel = bias = None
            for wname in lg.keys():
                arr = np.asarray(lg[wname])
                if wname.startswith("kernel"):
                    kernel = arr
                elif wname.startswith("bias"):
                    bias = arr
            if kernel is None or bias is None:
                raise ValueError(f"conv layer {name} missing kernel/bias")
            out.append((idx, name, kernel, bias))
    out.sort(key=lambda t: t[0])
    return [(n, k, b) for _, n, k, b in out]


def conv_param_order(arch: str):
    """Flax param-tree paths of the arch's convs, in construction order
    (== Keras creation order; models/networks.py keeps them aligned)."""
    if arch == "mercury":
        return [("Conv_0",), ("Conv_1",), ("Conv_2",)]
    if arch == "mars_moon":
        paths = [("Conv_0",)]
        for i in range(5):
            paths += [(f"_ResBlock_{i}", "Conv_0"), (f"_ResBlock_{i}", "Conv_1")]
        return paths + [("Conv_1",)]
    if arch == "jupiter_moon":
        paths = [("Conv_0",)]
        stage_features, prev = (32, 32, 64, 64, 32, 32), 32
        for i, feats in enumerate(stage_features):
            paths += [(f"_JupiterBlock_{i}", "Conv_0"),
                      (f"_JupiterBlock_{i}", "Conv_1")]
            if feats != prev:  # 1x1 projection, created AFTER the conv pair
                paths += [(f"_JupiterBlock_{i}", "Conv_2")]
            prev = feats
        return paths + [("Conv_1",)]
    raise KeyError(f"unknown arch '{arch}'")


def convert_model(h5_path: str, arch: str, in_channels: int, out_path: str):
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from solver_in_the_loop_tpu.models.networks import build_model

    convs = read_h5_convs(h5_path)
    paths = conv_param_order(arch)
    if len(convs) != len(paths):
        raise ValueError(
            f"{arch} expects {len(paths)} conv layers, h5 has {len(convs)}: "
            f"{[n for n, _, _ in convs]}")

    model = build_model(arch)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, in_channels)))
    params = jax.tree_util.tree_map(np.asarray, params)
    tree = params["params"]
    for path, (name, kernel, bias) in zip(paths, convs):
        node = tree
        for p in path[:-1]:
            node = node[p]
        leaf = node[path[-1]]
        if tuple(leaf["kernel"].shape) != tuple(kernel.shape):
            raise ValueError(f"{'/'.join(path)} kernel shape "
                             f"{leaf['kernel'].shape} != h5 {name} {kernel.shape}")
        leaf["kernel"] = kernel.astype(np.float32)
        leaf["bias"] = bias.astype(np.float32)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    n = sum(int(np.prod(k.shape)) + int(np.prod(b.shape)) for _, k, b in convs)
    print(f"wrote {out_path}: {len(convs)} convs, {n} params from {h5_path}")
    return params


def convert_datastats(pkl_path: str, out_path: str, scenario: str):
    """Reference dataStats.pickle -> our dataStats.json.

    Layouts (karman_train.py:234-255 / burgers_train.py:234-249):
      karman: {'std': (dens, (v, u)), 'ext.std': [re]}
      burgers: {'std': ((v, u), (fv, fu))}
    Staggered channel 0 is v (the legacy [...,0]=v layout, karman.py:104).
    """
    with open(pkl_path, "rb") as f:
        st = pickle.load(f)
    std = st["std"]
    if scenario == "karman":
        out = {"std.dens": float(std[0]), "std.v": float(std[1][0]),
               "std.u": float(std[1][1]), "ext.std": float(st["ext.std"][0])}
    else:
        out = {"std.v": float(std[0][0]), "std.u": float(std[0][1]),
               "std.fv": float(std[1][0]), "std.fu": float(std[1][1])}
    for key in ("in.std", "out.std"):  # present when seeded from PRE
        if key in st:
            out[key] = np.asarray(st[key], np.float32).ravel().tolist()
    out["leaky_alpha"] = 0.3  # Keras LeakyReLU() default (karman_train.py:105)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}: {out}")


def convert_pre_stats(pkl_path: str, out_path: str, scenario: str):
    """Reference PRE stats.pickle -> our stats.json
    (karman_train_pre.py:213-221 writes in.std/out.std [+ means])."""
    with open(pkl_path, "rb") as f:
        st = pickle.load(f)
    in_std = np.asarray(st["in.std"], np.float32).ravel()
    out = {
        "in.std": in_std.tolist(),
        "out.std": np.asarray(st["out.std"], np.float32).ravel().tolist(),
        "in.mean": np.asarray(st.get("in.mean", np.zeros_like(in_std)),
                              np.float32).ravel().tolist(),
        "out.mean": np.asarray(st.get("out.mean", [0.0, 0.0]),
                               np.float32).ravel().tolist(),
        "nozerocen": bool(st.get("nozerocen", False)),
        "ext.std": float(in_std[2]) if scenario == "karman" else 0.0,
        "scenario": scenario,
        "leaky_alpha": 0.3,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--h5", help="reference Keras model.h5")
    p.add_argument("--arch", default="mars_moon",
                   choices=["mercury", "mars_moon", "jupiter_moon"])
    p.add_argument("--in-channels", type=int, default=None,
                   help="feature channels (default: 3 karman, 4 burgers)")
    p.add_argument("--scenario", default="karman", choices=["karman", "burgers"])
    p.add_argument("--out", help="output model.msgpack path")
    p.add_argument("--stats", help="reference dataStats.pickle")
    p.add_argument("--stats-out", help="output dataStats.json path")
    p.add_argument("--pre-stats", help="reference PRE stats.pickle")
    p.add_argument("--pre-stats-out", help="output stats.json path")
    args = p.parse_args(argv)

    in_ch = args.in_channels or (3 if args.scenario == "karman" else 4)
    if args.h5:
        convert_model(args.h5, args.arch, in_ch, args.out or "model.msgpack")
    if args.stats:
        convert_datastats(args.stats, args.stats_out or "dataStats.json",
                          args.scenario)
    if args.pre_stats:
        convert_pre_stats(args.pre_stats, args.pre_stats_out or "stats.json",
                          args.scenario)


if __name__ == "__main__":
    main()
