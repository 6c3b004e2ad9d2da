# -*- coding: utf-8 -*-
"""Import reference PyTorch(-Lightning) checkpoints into climsr_tpu flax models.

Migration path for users of the reference framework: a ``.ckpt`` trained with
``xultaeculcis/climate-super-resolution`` (PL ``TaskSuperResolutionModule``,
``climsr/core/task.py:46-47`` holds ``self.generator``/``self.discriminator``)
loads directly into this framework's flax models for inference or fine-tuning.

Key-name sources (studied, not copied):

- SRCNN   ``climsr/models/srcnn.py``: ``conv{1,2,3}``
- ESRGAN  ``climsr/models/esrgan.py``: ``conv_first``,
  ``RRDB_trunk.{i}.RDB{1..3}.conv{1..5}``, ``trunk_conv``, ``upconv{1,2}``,
  ``HRconv``, ``conv_last``, fusion ``srcnn.conv{1,2,3}``
- RCAN    ``climsr/models/rcan.py``: ``head.0``,
  ``body.{g}.body.{b}.body.{0,2}`` (RCAB convs),
  ``body.{g}.body.{b}.body.3.conv_du.{0,2}`` (CALayer),
  ``body.{g}.body.{n_resblocks}`` (group tail), ``body.{n_resgroups}``,
  ``tail.0.{2k}`` (upsampler convs), ``tail.1``, ``srcnn.conv{1,2,3}``
- ESRGAN discriminator ``climsr/models/discriminator.py``:
  ``feature_extraction.{7i+1,7i+3,7i+5}`` (conv/bn/strided conv per block),
  ``feature_extraction.{28,30}``, ``classification.{0,1}``

Weight layout transforms: torch conv ``(O, I, kh, kw)`` -> flax HWIO
``(kh, kw, I, O)``; linear ``(O, I)`` -> ``(I, O)``; BatchNorm
``weight/bias/running_mean/running_var`` -> flax ``scale/bias`` params +
``mean/var`` batch_stats. torch ``PixelShuffle`` channel order matches
``climsr_tpu.ops.pixel_shuffle`` exactly, so no channel permutation is needed
for RCAN's upsampler convs.

No torch import is required at module load; ``torch`` is only imported inside
:func:`load_torch_checkpoint` (reading ``.ckpt``/``.pth`` files). Importers
accept a plain ``{name: np.ndarray}`` mapping.
"""
from __future__ import annotations

import logging
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

GENERATOR_PREFIX = "generator."
DISCRIMINATOR_PREFIX = "discriminator."


# --------------------------------------------------------------------------
# checkpoint loading / prefix handling
# --------------------------------------------------------------------------
def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.ckpt``/``.pth`` file -> flat {key: float32 ndarray}.

    PL checkpoints store weights under ``state_dict``; plain ``torch.save``d
    state dicts are accepted as-is.
    """
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # PL checkpoints pickle hyperparameters (incl. custom classes) next to
        # the weights; fall back to a full unpickle for those.
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy().astype(np.float32)
    return out


def split_pl_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Split a PL task state_dict into (generator_sd, discriminator_sd).

    Strips the ``generator.``/``discriminator.`` attribute prefixes
    (``climsr/core/task.py:46-47``). A state_dict without those prefixes is
    returned unchanged as the generator (bare ``nn.Module`` save).
    """
    gen = {k[len(GENERATOR_PREFIX):]: v for k, v in sd.items() if k.startswith(GENERATOR_PREFIX)}
    disc = {k[len(DISCRIMINATOR_PREFIX):]: v for k, v in sd.items() if k.startswith(DISCRIMINATOR_PREFIX)}
    if not gen and not disc:
        gen = dict(sd)
    return gen, disc


# --------------------------------------------------------------------------
# mapping specs: (torch_module_prefix, flax_path, kind)
# --------------------------------------------------------------------------
Spec = List[Tuple[str, str, str]]  # kind: "conv" | "dense" | "bn"


def _srcnn_spec(torch_prefix: str = "", flax_prefix: str = "") -> Spec:
    return [(f"{torch_prefix}conv{i}", f"{flax_prefix}conv{i}", "conv") for i in (1, 2, 3)]


def _esrgan_spec(sd: Dict[str, np.ndarray]) -> Spec:
    nb = 1 + max(
        (int(m.group(1)) for k in sd if (m := re.match(r"RRDB_trunk\.(\d+)\.", k))),
        default=-1,
    )
    spec: Spec = [("conv_first", "conv_first", "conv")]
    for i in range(nb):
        for j in (1, 2, 3):
            for k in range(1, 6):
                spec.append((f"RRDB_trunk.{i}.RDB{j}.conv{k}", f"RRDB_trunk_{i}/RDB{j}/conv{k}", "conv"))
    spec += [("trunk_conv", "trunk_conv", "conv"), ("upconv1", "upconv1", "conv")]
    if "upconv2.weight" in sd:  # scale 4 only (esrgan.py:82-83)
        spec.append(("upconv2", "upconv2", "conv"))
    spec += [("HRconv", "HRconv", "conv"), ("conv_last", "conv_last", "conv")]
    spec += _srcnn_spec("srcnn.", "srcnn/")
    return spec


def _rcan_spec(sd: Dict[str, np.ndarray]) -> Spec:
    groups = sorted({int(m.group(1)) for k in sd if (m := re.match(r"body\.(\d+)\.body\.", k))})
    if not groups:
        raise ValueError(
            "checkpoint has no 'body.N.body.*' keys — not an RCAN state_dict "
            "(wrong --generator / mislabeled checkpoint?)"
        )
    n_resgroups = 1 + max(groups, default=-1)
    blocks = sorted({int(m.group(1)) for k in sd if (m := re.match(rf"body\.{groups[0]}\.body\.(\d+)\.body\.", k))})
    n_resblocks = 1 + max(blocks, default=-1)
    spec: Spec = [("head.0", "head", "conv")]
    for g in range(n_resgroups):
        for b in range(n_resblocks):
            base = f"body.{g}.body.{b}.body"
            fl = f"group_{g}/rcab_{b}"
            spec += [
                (f"{base}.0", f"{fl}/conv1", "conv"),
                (f"{base}.2", f"{fl}/conv2", "conv"),
                (f"{base}.3.conv_du.0", f"{fl}/ca/du1", "conv"),
                (f"{base}.3.conv_du.2", f"{fl}/ca/du2", "conv"),
            ]
        spec.append((f"body.{g}.body.{n_resblocks}", f"group_{g}/conv_tail", "conv"))
    spec.append((f"body.{n_resgroups}", "body_tail", "conv"))
    k = 0
    while f"tail.0.{2 * k}.weight" in sd:  # Upsampler convs at even indices (rcan.py:28-43)
        spec.append((f"tail.0.{2 * k}", f"upsampler/conv_{k}", "conv"))
        k += 1
    spec.append(("tail.1", "tail_conv", "conv"))
    spec += _srcnn_spec("srcnn.", "srcnn/")
    return spec


def _drln_spec(sd: Dict[str, np.ndarray]) -> Spec:
    """DRLN (``climsr/models/drln.py``): ``head``, 20 dense ``b{i}`` blocks
    (ResidualBlock ``r{1..3}.body.{0,2}``, gate ``g.body.0``, CALayer
    ``ca.c1.body.0``/``ca.c4.body.0``), compressors ``c{1..20}.body.0``
    (``c4`` exists in the state_dict but is dead code — its weights are
    consumed and dropped), ``upsample.up.body.{0,3,...}``, ``tail``."""
    spec: Spec = [("head", "head", "conv")]
    for i in range(1, 21):
        for j in (1, 2, 3):
            spec += [
                (f"b{i}.r{j}.body.0", f"b{i}/r{j}/conv1", "conv"),
                (f"b{i}.r{j}.body.2", f"b{i}/r{j}/conv2", "conv"),
            ]
        spec += [
            (f"b{i}.g.body.0", f"b{i}/g/TorchConv_0", "conv"),
            (f"b{i}.ca.c1.body.0", f"b{i}/ca/c1/TorchConv_0", "conv"),
            (f"b{i}.ca.c4.body.0", f"b{i}/ca/c4", "conv"),
        ]
        if i == 4:  # dead compressor (never called in the reference forward)
            spec.append((f"c{i}.body.0", "", "ignore"))
        else:
            spec.append((f"c{i}.body.0", f"c{i}/TorchConv_0", "conv"))
    k = 0
    while f"upsample.up.body.{3 * k}.weight" in sd:  # [conv, relu, ps] per 2x stage
        spec.append((f"upsample.up.body.{3 * k}", f"upsample/conv_{k}", "conv"))
        k += 1
    spec.append(("tail", "tail", "conv"))
    return spec


def _rfb_block_spec(torch_prefix: str, flax_prefix: str) -> Spec:
    """ReceptiveFieldBlock (``climsr/models/rfb_esrgan.py:147-292``): shortcut +
    4 inception branches (convs at even Sequential indices) + conv1x1, all
    bias-free."""
    spec: Spec = [(f"{torch_prefix}.shortcut", f"{flax_prefix}/shortcut", "conv")]
    for branch, n_convs, fl in (("branch1", 2, "b1"), ("branch2", 3, "b2"), ("branch3", 3, "b3"), ("branch4", 4, "b4")):
        for k in range(n_convs):
            spec.append((f"{torch_prefix}.{branch}.{2 * k}", f"{flax_prefix}/{fl}_{k}", "conv"))
    spec.append((f"{torch_prefix}.conv1x1", f"{flax_prefix}/conv1x1", "conv"))
    return spec


def _rfb_esrgan_spec(sd: Dict[str, np.ndarray]) -> Spec:
    """RFB-ESRGAN generator (``climsr/models/rfb_esrgan.py:72-145``)."""

    def count(pattern: str) -> int:
        return 1 + max((int(m.group(1)) for k in sd if (m := re.match(pattern, k))), default=-1)

    n_a = count(r"Trunk_A\.(\d+)\.")
    n_rfb = count(r"Trunk_RFB\.(\d+)\.")
    n_up = count(r"upsampling\.(\d+)\.") // 6  # 6 modules per upsample block

    spec: Spec = [("conv1", "conv1", "conv")]
    for i in range(n_a):
        for j in (1, 2, 3):
            for k in (1, 2, 3, 4):  # Sequential(conv, lrelu) -> .0
                spec.append((f"Trunk_A.{i}.RDB{j}.conv{k}.0", f"trunk_a_{i}/RDB{j}/conv{k}", "conv"))
            spec.append((f"Trunk_A.{i}.RDB{j}.conv5", f"trunk_a_{i}/RDB{j}/conv5", "conv"))
    for i in range(n_rfb):
        for j in (1, 2, 3):
            for m in (1, 2, 3, 4, 5):
                spec += _rfb_block_spec(f"Trunk_RFB.{i}.RFDB{j}.RFB{m}", f"trunk_rfb_{i}/RFDB{j}/RFB{m}")
    spec += _rfb_block_spec("RFB", "RFB")
    for b in range(n_up):
        spec += _rfb_block_spec(f"upsampling.{6 * b + 1}", f"up_{b}_rfb1")
        spec.append((f"upsampling.{6 * b + 2}", f"up_{b}_conv", "conv"))
        spec += _rfb_block_spec(f"upsampling.{6 * b + 5}", f"up_{b}_rfb2")
    spec += [("conv3.0", "conv3", "conv"), ("conv4.0", "conv4", "conv")]
    return spec


def _rfb_discriminator_spec(sd: Dict[str, np.ndarray]) -> Spec:
    """RFB-ESRGAN VGG-style discriminator (``climsr/models/rfb_esrgan.py:23-69``)."""
    spec: Spec = [("features.0", "conv0", "conv")]
    for i in range(1, 8):
        base = 3 * i - 1  # convs at 2,5,8,...; BN right after each
        spec += [(f"features.{base}", f"conv{i}", "conv"), (f"features.{base + 1}", f"bn{i}", "bn")]
    spec += [("fc.0", "fc1", "dense"), ("fc.2", "fc2", "dense")]
    return spec


def _discriminator_spec(sd: Dict[str, np.ndarray]) -> Spec:
    n_blocks = sum(1 for k in sd if re.match(r"feature_extraction\.\d+\.running_mean$", k))
    spec: Spec = []
    for i in range(n_blocks):
        spec += [
            (f"feature_extraction.{7 * i + 1}", f"block{i}_conv1", "conv"),
            (f"feature_extraction.{7 * i + 3}", f"block{i}_bn", "bn"),
            (f"feature_extraction.{7 * i + 5}", f"block{i}_conv2", "conv"),
        ]
    base = 7 * n_blocks
    spec += [
        (f"feature_extraction.{base}", "head_conv1", "conv"),
        (f"feature_extraction.{base + 2}", "head_conv2", "conv"),
        ("classification.0", "fc1", "dense"),
        ("classification.1", "fc2", "dense"),
    ]
    return spec


_GENERATOR_SPECS = {
    "srcnn": lambda sd: _srcnn_spec(),
    "esrgan": _esrgan_spec,
    "rcan": _rcan_spec,
    "drln": _drln_spec,
    "rfb_esrgan": _rfb_esrgan_spec,
}


# --------------------------------------------------------------------------
# assembly
# --------------------------------------------------------------------------
def _set_path(tree: dict, path: str, leaf: dict) -> None:
    node = tree
    parts = path.split("/")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = leaf


def _assemble(sd: Dict[str, np.ndarray], spec: Spec, strict: bool) -> Tuple[dict, dict]:
    params: dict = {}
    batch_stats: dict = {}
    used = set()
    missing = []
    for tk, fp, kind in spec:
        if kind == "conv":
            wk, bk = f"{tk}.weight", f"{tk}.bias"
            if wk not in sd:
                missing.append(wk)
                continue
            leaf = {"kernel": np.transpose(sd[wk], (2, 3, 1, 0))}
            used.add(wk)
            if bk in sd:
                leaf["bias"] = sd[bk]
                used.add(bk)
            _set_path(params, f"{fp}/Conv_0", leaf)
        elif kind == "dense":
            wk, bk = f"{tk}.weight", f"{tk}.bias"
            if wk not in sd:
                missing.append(wk)
                continue
            leaf = {"kernel": np.transpose(sd[wk])}
            used.add(wk)
            if bk in sd:
                leaf["bias"] = sd[bk]
                used.add(bk)
            _set_path(params, f"{fp}/Dense_0", leaf)
        elif kind == "bn":
            need = [f"{tk}.weight", f"{tk}.bias", f"{tk}.running_mean", f"{tk}.running_var"]
            if any(k not in sd for k in need):
                missing.extend(k for k in need if k not in sd)
                continue
            _set_path(params, fp, {"scale": sd[need[0]], "bias": sd[need[1]]})
            _set_path(batch_stats, fp, {"mean": sd[need[2]], "var": sd[need[3]]})
            used.update(need)
        elif kind == "ignore":  # dead reference weights (e.g. DRLN's unused c4)
            used.update(k for k in (f"{tk}.weight", f"{tk}.bias") if k in sd)
        else:  # pragma: no cover
            raise ValueError(f"unknown kind {kind}")
    unused = sorted(k for k in sd if k not in used and not k.endswith("num_batches_tracked"))
    if missing and strict:
        raise KeyError(f"checkpoint is missing expected keys (first 10): {missing[:10]}")
    if unused and strict:
        raise KeyError(f"checkpoint has unmapped keys (first 10): {unused[:10]}")
    if missing:
        logger.warning("torch import: %d expected keys missing (e.g. %s)", len(missing), missing[:3])
    if unused:
        logger.warning("torch import: %d checkpoint keys unused (e.g. %s)", len(unused), unused[:3])
    return params, batch_stats


def _verify_against_model(params: dict, model, example_inputs, label: str) -> None:
    """Shape-check the imported tree against ``model.init`` (no FLOPs)."""
    import jax

    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0), *example_inputs)["params"]
    ref_flat = {"/".join(str(p.key) for p in path): leaf.shape for path, leaf in
                jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_flat = {"/".join(str(p.key) for p in path): leaf.shape for path, leaf in
                jax.tree_util.tree_flatten_with_path(params)[0]}
    extra = sorted(set(got_flat) - set(ref_flat))
    absent = sorted(set(ref_flat) - set(got_flat))
    bad = [k for k in set(got_flat) & set(ref_flat) if tuple(got_flat[k]) != tuple(ref_flat[k])]
    if extra or absent or bad:
        detail = []
        if absent:
            detail.append(f"missing {absent[:5]}")
        if extra:
            detail.append(f"unexpected {extra[:5]}")
        if bad:
            detail.append(f"shape mismatch {[(k, got_flat[k], ref_flat[k]) for k in bad[:5]]}")
        raise ValueError(f"{label} import does not match the flax model: " + "; ".join(detail))


def import_generator_params(
    generator_type: str,
    sd: Dict[str, np.ndarray],
    model=None,
    example_inputs: Optional[tuple] = None,
    strict: bool = True,
) -> dict:
    """Translate a reference generator state_dict -> flax ``params`` tree.

    ``model``/``example_inputs`` (optional) enable a full structure+shape
    verification against ``model.init`` via ``jax.eval_shape``.
    """
    if generator_type not in _GENERATOR_SPECS:
        raise NotImplementedError(
            f"torch import for generator '{generator_type}' not implemented "
            f"(supported: {sorted(_GENERATOR_SPECS)})"
        )
    spec = _GENERATOR_SPECS[generator_type](sd)
    params, batch_stats = _assemble(sd, spec, strict)
    if batch_stats:
        raise ValueError(f"generator '{generator_type}' unexpectedly produced batch_stats")
    if model is not None and example_inputs is not None:
        _verify_against_model(params, model, example_inputs, generator_type)
    return params


TORCH_SUFFIXES = {".ckpt", ".pth", ".pt"}


def is_torch_checkpoint(path) -> bool:
    """True if ``path`` is a torch/PL checkpoint *file* (vs an orbax dir)."""
    from pathlib import Path

    p = Path(path)
    return p.suffix.lower() in TORCH_SUFFIXES and p.is_file()


def detect_generator_type(sd: Dict[str, np.ndarray]) -> str:
    """Infer the generator family from reference state_dict key names."""
    if any(k.startswith("RRDB_trunk.") for k in sd):
        return "esrgan"
    if any(k.startswith("Trunk_A.") for k in sd):
        return "rfb_esrgan"
    if any(k.startswith("b1.ca.c1.") for k in sd):
        return "drln"
    if any(re.match(r"body\.\d+\.body\.", k) for k in sd):
        return "rcan"
    if sd and all(re.match(r"conv[123]\.(weight|bias)$", k) for k in sd):
        return "srcnn"
    raise ValueError(
        "could not infer generator type from checkpoint keys "
        f"(first 5: {sorted(sd)[:5]}); pass generator_type explicitly"
    )


def load_reference_generator_params(
    path: str, generator_type: Optional[str] = None, strict: bool = False
) -> Tuple[str, dict]:
    """One-call migration: reference ``.ckpt``/``.pth`` -> (type, flax params).

    ``strict=False`` mirrors the reference's ``load_from_checkpoint(strict=False)``
    inference path (``climsr/inference/inference.py:125``).
    """
    sd = load_torch_checkpoint(path)
    gen_sd, _ = split_pl_state_dict(sd)
    gt = generator_type or detect_generator_type(gen_sd)
    logger.info("importing reference %s checkpoint %s (%d tensors)", gt, path, len(gen_sd))
    return gt, import_generator_params(gt, gen_sd, strict=strict)


def _get_path(tree: dict, path: str):
    node = tree
    for p in path.split("/"):
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def export_generator_params(generator_type: str, params: dict) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_generator_params`: flax params -> a reference-
    style torch state_dict (plain numpy arrays, reference key names/layouts).

    Useful for moving models back to the reference framework or comparing
    against torch implementations. Round-trip
    ``import(export(params)) == params`` is exact.
    """
    if generator_type not in _GENERATOR_SPECS:
        raise NotImplementedError(f"export for '{generator_type}' not implemented")
    # build a probe sd from the params tree so size-inferring specs work
    probe: Dict[str, np.ndarray] = {}
    if generator_type == "esrgan":
        i = 0
        while _get_path(params, f"RRDB_trunk_{i}"):
            probe[f"RRDB_trunk.{i}.RDB1.conv1.weight"] = None
            i += 1
        if _get_path(params, "upconv2"):
            probe["upconv2.weight"] = None
    elif generator_type == "rcan":
        g = 0
        while _get_path(params, f"group_{g}"):
            b = 0
            while _get_path(params, f"group_{g}/rcab_{b}"):
                probe[f"body.{g}.body.{b}.body.0.weight"] = None
                b += 1
            g += 1
        k = 0
        while _get_path(params, f"upsampler/conv_{k}"):
            probe[f"tail.0.{2 * k}.weight"] = None
            k += 1
    elif generator_type == "drln":
        k = 0
        while _get_path(params, f"upsample/conv_{k}"):
            probe[f"upsample.up.body.{3 * k}.weight"] = None
            k += 1
    elif generator_type == "rfb_esrgan":
        for flax_prefix, torch_tpl in (
            ("trunk_a_", "Trunk_A.{i}.RDB1.conv1.0.weight"),
            ("trunk_rfb_", "Trunk_RFB.{i}.RFDB1.RFB1.shortcut.weight"),
        ):
            i = 0
            while _get_path(params, f"{flax_prefix}{i}"):
                probe[torch_tpl.format(i=i)] = None
                i += 1
        b = 0
        while _get_path(params, f"up_{b}_rfb1"):
            probe[f"upsampling.{6 * b + 5}.weight"] = None
            b += 1
    spec = _GENERATOR_SPECS[generator_type](probe)
    sd: Dict[str, np.ndarray] = {}
    for tk, fp, kind in spec:
        if kind == "ignore":
            continue
        container = "Conv_0" if kind == "conv" else "Dense_0"
        leaf = _get_path(params, f"{fp}/{container}")
        if leaf is None:
            raise KeyError(f"params tree is missing {fp}/{container} (expected by '{generator_type}' layout)")
        w = np.asarray(leaf["kernel"], np.float32)
        sd[f"{tk}.weight"] = np.transpose(w, (3, 2, 0, 1)) if kind == "conv" else np.transpose(w)
        if "bias" in leaf:
            sd[f"{tk}.bias"] = np.asarray(leaf["bias"], np.float32)
    return sd


def import_discriminator_params(
    sd: Dict[str, np.ndarray],
    model=None,
    example_inputs: Optional[tuple] = None,
    strict: bool = True,
) -> Tuple[dict, dict]:
    """Translate a reference discriminator state_dict (ESRGAN or RFB-ESRGAN,
    auto-detected by key names). Returns ``(params, batch_stats)`` trees.
    """
    is_rfb = any(k.startswith("features.") for k in sd)
    spec = _rfb_discriminator_spec(sd) if is_rfb else _discriminator_spec(sd)
    params, batch_stats = _assemble(sd, spec, strict)
    if model is not None and example_inputs is not None:
        _verify_against_model(params, model, example_inputs, "discriminator")
    return params, batch_stats
