"""PyTorch ``.pth`` checkpoint importer.

The reference publishes pretrained checkpoints (HF, README.md:27) as torch
``state_dict``s whose keys are ``nn.Sequential`` indices (``model.14.weight``
...), because pix2pixHD builds every net as a Sequential
(networks.py:301-353, 173-247, 641-692).  This module *replays the reference's
construction order* for a given architecture config to produce the
torch-key -> flax-path mapping as data, then converts tensors:

  * Conv2d        (O,I,kH,kW)  -> kernel (kH,kW,I,O)
  * ConvTranspose2d (I,O,kH,kW) -> flax ConvTranspose(transpose_kernel=True)
                                   kernel (kH,kW,O,I)
  * BatchNorm2d   weight/bias -> params scale/bias;
                  running_mean/var -> batch_stats mean/var
  * InstanceNorm2d(affine=False) — no parameters (skipped)

The reverse direction (flax -> torch) is also provided so round-trip tests
can validate the mapping without reference checkpoints on disk.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import flax.traverse_util as traverse

# ---------------------------------------------------------------------------
# Mapping-table construction (replays reference construction order)
# ---------------------------------------------------------------------------

# Entry: (torch_prefix, flax_path, kind); kind in
#   conv | convT | bn | posemb_h | posemb_w
Entry = Tuple[str, Tuple[str, ...], str]


class _Seq:
    """Simulates nn.Sequential index assignment."""

    def __init__(self, torch_name: str):
        self.name = torch_name
        self.idx = 0
        self.entries: List[Entry] = []

    def skip(self, n: int = 1) -> None:  # pads / norms / activations
        self.idx += n

    def here(self) -> str:
        return f"{self.name}.{self.idx}"

    def add(self, kind: str, flax_path: Tuple[str, ...], sub: str = "") -> None:
        prefix = self.here() + (f".{sub}" if sub else "")
        self.entries.append((prefix, flax_path, kind))

    def conv(self, flax_path: Tuple[str, ...]) -> None:
        self.add("conv", flax_path)
        self.idx += 1

    def module(self, emit) -> None:
        """Emit entries for a composite module occupying one index."""
        emit(self.here(), self.entries)
        self.idx += 1


def _conv_resblock(prefix: str, path: Tuple[str, ...], out: List[Entry]) -> None:
    out.append((f"{prefix}.conv1", path + ("conv1", "conv"), "conv"))
    out.append((f"{prefix}.conv2", path + ("conv2", "conv"), "conv"))
    out.append((f"{prefix}.conv_res", path + ("conv_res", "conv"), "conv"))


# InterpolateUpsample has the same three conv attribute names (networks.py:
# 383-392) — the mapping entries are identical to ConvResBlock's.
_interp_upsample = _conv_resblock


def _resnet_block(prefix: str, path: Tuple[str, ...], out: List[Entry]) -> None:
    # ResnetBlock.conv_block: 0 pad, 1 conv, 2 norm, 3 act, 4 pad, 5 conv, 6 norm
    out.append((f"{prefix}.conv_block.1", path + ("conv1", "conv"), "conv"))
    out.append((f"{prefix}.conv_block.5", path + ("conv2", "conv"), "conv"))


def _bottle_stack(
    prefix: str,
    path: Tuple[str, ...],
    num_layers: int,
    first_has_shortcut: bool,
    out: List[Entry],
) -> None:
    """bottleneck_transformer_pytorch 0.1.4 BottleStack.net = Sequential of
    BottleBlocks; each block.net: 0 conv,1 bn,2 act,3 attn,4 pool/id,5 bn,
    6 act,7 conv,8 bn; optional shortcut: 0 conv,1 bn,2 act."""
    for layer in range(num_layers):
        b = f"{prefix}.net.{layer}"
        p = path + (f"block{layer}",)
        if layer == 0 and first_has_shortcut:
            out.append((f"{b}.shortcut.0", p + ("shortcut_conv",), "conv"))
            out.append((f"{b}.shortcut.1", p + ("shortcut_bn", "bn"), "bn"))
        out.append((f"{b}.net.0", p + ("proj_in",), "conv"))
        out.append((f"{b}.net.1", p + ("bn1", "bn"), "bn"))
        out.append((f"{b}.net.3.to_qkv", p + ("attn", "to_qkv"), "conv"))
        out.append((f"{b}.net.3.pos_emb", p + ("attn", "pos_emb"), "posemb"))
        out.append((f"{b}.net.5", p + ("bn2", "bn"), "bn"))
        out.append((f"{b}.net.7", p + ("proj_out",), "conv"))
        out.append((f"{b}.net.8", p + ("bn3", "bn"), "bn"))


def _down_layer(seq: _Seq, kind: str, path: Tuple[str, ...]) -> None:
    if kind == "conv":
        seq.add("conv", path + ("conv",))
        seq.idx += 1
    else:  # resconv
        seq.module(lambda pfx, out: _conv_resblock(pfx, path, out))
    seq.skip(2)  # norm, relu


def _up_layer(seq: _Seq, kind: str, path: Tuple[str, ...]) -> None:
    if kind == "transconv":
        seq.add("convT", path + ("conv",))
        seq.idx += 1
    else:  # interpolate
        seq.module(lambda pfx, out: _interp_upsample(pfx, path, out))
    seq.skip(2)  # norm, relu


def global_generator_entries(
    torch_name: str,
    flax_prefix: Tuple[str, ...],
    n_downsampling: int,
    n_blocks: int,
    n_attn: int,
    downsample_type: str,
    upsample_type: str,
    include_head: bool,
) -> List[Entry]:
    """Replay GlobalGenerator.__init__ (networks.py:301-353)."""
    seq = _Seq(torch_name)
    seq.skip(1)  # ReflectionPad2d(3)
    seq.conv(flax_prefix + ("stem", "conv"))
    seq.skip(2)  # norm, relu
    for i in range(n_downsampling):
        if downsample_type == "conv":
            _down_layer(seq, "conv", flax_prefix + (f"down{i}",))
        else:
            _down_layer(seq, "resconv", flax_prefix + (f"down{i}",))
    mid = n_blocks // 2
    for i in range(n_blocks + (1 if n_attn > 0 else 0)):
        # bottleneck order: res0..res(mid-1), attn, res(mid)..res(n-1)
        if n_attn > 0 and i == mid:
            seq.module(
                lambda pfx, out: _bottle_stack(
                    pfx, flax_prefix + ("attn",), n_attn, False, out
                )
            )
        else:
            r = i if (n_attn == 0 or i < mid) else i - 1
            seq.module(
                lambda pfx, out, r=r: _resnet_block(
                    pfx, flax_prefix + (f"res{r}",), out
                )
            )
    for i in range(n_downsampling):
        _up_layer(seq, upsample_type, flax_prefix + (f"up{i}",))
    if include_head:
        seq.skip(1)  # pad
        seq.conv(flax_prefix + ("head", "conv"))
        seq.skip(1)  # tanh
    return seq.entries


def local_enhancer_entries(
    n_downsample_global: int,
    n_blocks_global: int,
    n_attn_global: int,
    n_blocks_local: int,
    n_attn_local: int,
    downsample_type: str,
    upsample_type: str,
    n_local_enhancers: int = 1,
) -> List[Entry]:
    """Replay LocalEnhancer.__init__ (networks.py:173-247): ``model`` is the
    truncated global, ``model{n}_1`` the branch-n stem, ``model{n}_2`` the
    branch-n refine/upsample stack.  The reference fork hardcodes one branch
    (model1_1/model1_2); N > 1 follows upstream pix2pixHD's model%d loop
    (head only on the last branch), matching our generalized flax module."""
    entries = global_generator_entries(
        "model",
        ("global",),
        n_downsample_global,
        n_blocks_global,
        n_attn_global,
        downsample_type,
        upsample_type,
        include_head=False,
    )
    for n in range(1, n_local_enhancers + 1):
        p = "" if n == n_local_enhancers else f"enh{n}_"
        with_head = n == n_local_enhancers

        # model{n}_1: pad, conv7, norm, relu, down, norm, relu
        seq = _Seq(f"model{n}_1")
        seq.skip(1)
        seq.conv((f"{p}local_stem", "conv"))
        seq.skip(2)
        if downsample_type == "conv":
            seq.add("conv", (f"{p}local_down", "conv"))
            seq.idx += 1
        else:
            seq.module(
                lambda pfx, out: _conv_resblock(pfx, (f"{p}local_down",), out)
            )
        seq.skip(2)
        entries += seq.entries

        # model{n}_2: resblocks (+ optional [down-seq, attn] at middle and 3
        # shared ups after), final upsample[, pad, conv7, tanh on the last]
        seq = _Seq(f"model{n}_2")
        mid = n_blocks_local // 2

        def emit_attn(seq: _Seq, p: str = p) -> None:
            # the inserted `down` is itself a Sequential at one index:
            # [down0, norm, relu, shared, norm, relu, shared, norm, relu]
            pfx = seq.here()
            _sub = _Seq(pfx)
            if downsample_type == "conv":
                _sub.add("conv", (f"{p}local_attn_down0", "conv"))
                _sub.idx += 1
            else:
                _sub.module(
                    lambda q, o: _conv_resblock(q, (f"{p}local_attn_down0",), o)
                )
            _sub.skip(2)
            # shared module registered twice (`[layer, norm, relu]*2`,
            # networks.py:224-226): torch state_dict emits its tensors
            # under BOTH Sequential indices, so map both occurrences onto
            # the one flax module (identical values).
            for _ in range(2):
                if downsample_type == "conv":
                    _sub.add("conv", (f"{p}local_attn_down_shared", "conv"))
                    _sub.idx += 1
                else:
                    _sub.module(
                        lambda q, o: _conv_resblock(
                            q, (f"{p}local_attn_down_shared",), o
                        )
                    )
                _sub.skip(2)
            seq.entries.extend(_sub.entries)
            seq.idx += 1
            # attention: dim = ngf_l != dim_out = ngf_l*2 -> shortcut
            seq.module(
                lambda pfx2, out: _bottle_stack(
                    pfx2, (f"{p}local_attn",), n_attn_local, True, out
                )
            )

        for i in range(n_blocks_local):
            if n_attn_local > 0 and i == mid:
                emit_attn(seq)
            seq.module(
                lambda pfx2, out, i=i: _resnet_block(
                    pfx2, (f"{p}local_res{i}",), out
                )
            )
        if n_blocks_local == 0 and n_attn_local > 0:
            # list-insert places the bottleneck even with zero resblocks
            emit_attn(seq)
        if n_attn_local > 0:
            # 3x shared upsample (`[up, norm, relu]*3`, networks.py:236-237):
            # the state_dict repeats the shared tensors under all three
            # Sequential indices — map each occurrence to the one flax module.
            for _ in range(3):
                _up_layer(seq, upsample_type, (f"{p}local_attn_up_shared",))
        _up_layer(seq, upsample_type, (f"{p}local_up",))
        if with_head:
            seq.skip(1)
            seq.conv((f"{p}local_head", "conv"))
            seq.skip(1)
        entries += seq.entries
    return entries


def discriminator_entries(num_d: int, n_layers: int) -> List[Entry]:
    """Replay MultiscaleDiscriminator with getIntermFeat (networks.py:515-523):
    per scale i, groups scale{i}_layer{j}, conv at sub-index 0."""
    entries: List[Entry] = []
    for i in range(num_d):
        for j in range(n_layers + 2):
            entries.append(
                (
                    f"scale{i}_layer{j}.0",
                    (f"scale{i}", f"layer{j}", "conv"),
                    "conv",
                )
            )
    return entries


def generator_entries_for(gen) -> List[Entry]:
    """Mapping table for one of our generator modules."""
    from mdctgan_tpu.models.generator import GlobalGenerator, LocalEnhancer

    if isinstance(gen, LocalEnhancer):
        return local_enhancer_entries(
            gen.n_downsample_global,
            gen.n_blocks_global,
            gen.n_attn_global,
            gen.n_blocks_local,
            gen.n_attn_local,
            gen.downsample_type,
            gen.upsample_type,
            gen.n_local_enhancers,
        )
    if isinstance(gen, GlobalGenerator):
        return global_generator_entries(
            "model",
            (),
            gen.n_downsampling,
            gen.n_blocks,
            gen.n_attn,
            gen.downsample_type,
            gen.upsample_type,
            gen.include_head,
        )
    raise TypeError(f"unsupported generator {type(gen)}")


# ---------------------------------------------------------------------------
# Tensor conversion
# ---------------------------------------------------------------------------

def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    # Copy: torch's .numpy() (and numpy transposes of it) are VIEWS of live
    # torch storage, so an imported tree would silently track any later
    # in-place mutation of the source model (optimizer steps, _randomize).
    return np.array(t)


def expected_torch_keys(entries: List[Entry]) -> Tuple[List[str], List[str]]:
    """The torch ``state_dict`` key names a mapping table implies.

    Returns ``(required, optional)``; optional keys are conv biases (BotNet's
    1x1 convs are bias-free) and BN ``num_batches_tracked`` counters."""
    req: List[str] = []
    opt: List[str] = []
    for prefix, _path, kind in entries:
        if kind in ("conv", "convT"):
            req.append(f"{prefix}.weight")
            opt.append(f"{prefix}.bias")
        elif kind == "bn":
            req += [
                f"{prefix}.weight",
                f"{prefix}.bias",
                f"{prefix}.running_mean",
                f"{prefix}.running_var",
            ]
            opt.append(f"{prefix}.num_batches_tracked")
        elif kind == "posemb":
            req += [f"{prefix}.height", f"{prefix}.width"]
        else:
            raise ValueError(kind)
    return req, opt


def convert_state_dict(
    state_dict: Dict[str, Any],
    entries: List[Entry],
    expected_shapes: Optional[Dict[str, Tuple[int, ...]]] = None,
) -> Tuple[Dict, Dict, List[str], List[str]]:
    """torch state_dict -> (params flat dict, batch_stats flat dict,
    unconsumed torch keys, missing required torch keys).

    Entries whose required keys are absent are skipped (recorded in
    ``missing``) so callers can implement the reference's fuzzy fallbacks
    (base_model.py:61-111) instead of failing outright.  When
    ``expected_shapes`` (torch-layout, per torch key) is given, a
    present-but-wrong-shaped tensor counts as missing too — the reference's
    ladder checks ``param.size() != model_dict[name].size()``
    (base_model.py:76) and keeps the net's own init for such keys."""
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    consumed = set()
    missing: List[str] = []

    def take(key: str) -> Optional[np.ndarray]:
        if key in state_dict:
            v = _to_np(state_dict[key])
            if (expected_shapes is not None
                    and key in expected_shapes
                    and tuple(v.shape) != tuple(expected_shapes[key])):
                return None  # size mismatch: leave unconsumed (-> leftover)
            consumed.add(key)
            return v
        return None

    def require(key: str) -> Optional[np.ndarray]:
        t = take(key)
        if t is None:
            missing.append(key)
        return t

    for prefix, path, kind in entries:
        if kind in ("conv", "convT"):
            w = require(f"{prefix}.weight")
            if w is not None:
                # conv (O,I,kH,kW) and convT (I,O,kH,kW) both -> (kH,kW,·,·):
                # flax Conv kernel is (kH,kW,I,O); ConvTranspose with
                # transpose_kernel=True takes (kH,kW,O,I).
                params[path + ("kernel",)] = np.transpose(w, (2, 3, 1, 0))
            b = take(f"{prefix}.bias")
            if b is not None:
                params[path + ("bias",)] = b
        elif kind == "bn":
            w = require(f"{prefix}.weight")
            b = require(f"{prefix}.bias")
            m = require(f"{prefix}.running_mean")
            v = require(f"{prefix}.running_var")
            if w is not None:
                params[path + ("scale",)] = w
            if b is not None:
                params[path + ("bias",)] = b
            if m is not None:
                stats[path + ("mean",)] = m
            if v is not None:
                stats[path + ("var",)] = v
            take(f"{prefix}.num_batches_tracked")  # discard
        elif kind == "posemb":
            h = require(f"{prefix}.height")
            w = require(f"{prefix}.width")
            if h is not None:
                params[path + ("height",)] = h
            if w is not None:
                params[path + ("width",)] = w
        else:
            raise ValueError(kind)

    leftover = [k for k in state_dict if k not in consumed]
    return params, stats, leftover, missing


class InitValuesNeeded(Exception):
    """The fuzzy ladder must fall back to init VALUES but was only given
    abstract shapes (e.g. a jax.eval_shape template).  Callers catch this,
    materialize a real ``Module.init``, and retry — so the common
    everything-matches path never pays a device init/compile."""


def apply_param_key_map(
    state_dict: Dict[str, Any],
    key_map: Dict[str, str],
    consumed_ok: set,
) -> Dict[str, Any]:
    """Reference ``--param_key_map`` module renames (base_model.py:74-85):
    for a torch key whose first two components form ``a.b`` with ``a.b`` in
    the map, component ``b`` is replaced by ``map["a.b"]``.  Only keys that
    did not already load (missing from the model, or size-mismatched — the
    reference's ``name not in model_dict or param.size() != ...`` test) are
    renamed."""
    if not key_map:
        return state_dict
    out: Dict[str, Any] = {}
    for name, value in state_dict.items():
        parts = name.split(".")
        if name not in consumed_ok and len(parts) >= 2:
            key = parts[0] + "." + parts[1]
            if key in key_map:
                parts[1] = key_map[key]
                new = ".".join(parts)
                print(f"    {name} -> {new}")
                out[new] = value
                continue
        out[name] = value
    return out


def _leaf_shape(v) -> Tuple[int, ...]:
    """Shape of a concrete array OR an abstract ShapeDtypeStruct leaf."""
    s = getattr(v, "shape", None)
    return tuple(s) if s is not None else tuple(np.shape(v))


def _is_abstract(tree) -> bool:
    # trees are homogeneous (all concrete arrays or all ShapeDtypeStructs),
    # so inspecting the first leaf suffices
    for leaf in traverse.flatten_dict(tree).values():
        return not hasattr(leaf, "__array__") and not isinstance(
            leaf, (np.ndarray, float, int)
        )
    return False


def _torch_shapes(
    entries: List[Entry], init_params: Dict, init_stats: Optional[Dict]
) -> Dict[str, Tuple[int, ...]]:
    """Torch-layout expected shape per torch key (from the init template,
    which may be abstract)."""
    flat_p = traverse.flatten_dict(init_params)
    flat_s = traverse.flatten_dict(init_stats) if init_stats else {}
    out: Dict[str, Tuple[int, ...]] = {}
    for prefix, path, kind in entries:
        if kind in ("conv", "convT"):
            k = flat_p.get(path + ("kernel",))
            if k is not None:
                s = _leaf_shape(k)  # (kH, kW, ·, ·)
                out[f"{prefix}.weight"] = (s[3], s[2], s[0], s[1])
            b = flat_p.get(path + ("bias",))
            if b is not None:
                out[f"{prefix}.bias"] = _leaf_shape(b)
        elif kind == "bn":
            for leaf, name, flat in (("weight", "scale", flat_p),
                                     ("bias", "bias", flat_p),
                                     ("running_mean", "mean", flat_s),
                                     ("running_var", "var", flat_s)):
                v = flat.get(path + (name,))
                if v is not None:
                    out[f"{prefix}.{leaf}"] = _leaf_shape(v)
        elif kind == "posemb":
            for leaf in ("height", "width"):
                v = flat_p.get(path + (leaf,))
                if v is not None:
                    out[f"{prefix}.{leaf}"] = _leaf_shape(v)
    return out


def _fuzzy_import(
    state_dict: Dict[str, Any],
    entries: List[Entry],
    what: str,
    param_key_map: Optional[Dict[str, str]],
    init_params: Optional[Dict],
    init_stats: Optional[Dict],
) -> Tuple[Dict, Dict]:
    """Strict load, then the reference's fallback ladder
    (base_model.py:61-111): drop excessive keys -> --param_key_map renames ->
    keep initialization for still-missing/size-mismatched modules (printing
    size-matched candidates).  Without ``init_params`` a missing key is an
    error — there is nothing to fall back on.  ``init_params`` may be an
    abstract (jax.eval_shape) template; if the ladder actually needs its
    VALUES, ``InitValuesNeeded`` is raised for the caller to materialize."""
    shapes = (_torch_shapes(entries, init_params, init_stats)
              if init_params is not None else None)
    flat_p, flat_s, leftover, missing = convert_state_dict(
        state_dict, entries, shapes
    )
    if missing and param_key_map:
        req, opt_keys = expected_torch_keys(entries)
        consumed_ok = (set(req) | set(opt_keys)) - set(missing)
        state_dict = apply_param_key_map(state_dict, param_key_map, consumed_ok)
        flat_p, flat_s, leftover, missing = convert_state_dict(
            state_dict, entries, shapes
        )

    def merge_init():
        """Overlay the imported leaves onto the full init tree (base_model.py:94
        copies only what it can; everything else stays initialized)."""
        base_p = dict(traverse.flatten_dict(init_params))
        base_p.update(flat_p)
        base_s = dict(traverse.flatten_dict(init_stats or {}))
        base_s.update(flat_s)
        return base_p, base_s

    if missing:
        if init_params is None:
            raise ValueError(
                f"missing torch keys for {what} (arch mismatch?): {missing[:8]}"
            )
        if _is_abstract(init_params):
            raise InitValuesNeeded(missing[:8])
        print(
            f"Pretrained network {what} has fewer layers; "
            "The following layers are possibly matched:"
        )
        by_shape: Dict[Tuple[int, ...], List[str]] = {}
        for k in leftover:
            by_shape.setdefault(tuple(np.shape(_to_np(state_dict[k]))), []).append(k)
        assert shapes is not None
        for name in missing:
            for cand in by_shape.get(shapes.get(name), []):
                print(f"     {name} : {cand}")
        flat_p, flat_s = merge_init()
    elif init_params is not None:
        # Leaves the flax module owns that no torch key produced.  Distinct
        # from ``missing`` (required keys): an OPTIONAL key can be absent —
        # e.g. a checkpoint saved from a bias-free conv variant while our
        # module has use_bias=True — and must still fall back to init
        # values, else the incomplete tree fails much later inside
        # Module.apply instead of here.
        absent = [k for k in traverse.flatten_dict(init_params)
                  if k not in flat_p]
        if init_stats:
            absent += [k for k in traverse.flatten_dict(init_stats)
                       if k not in flat_s]
        if absent:
            if _is_abstract(init_params):
                raise InitValuesNeeded(
                    [".".join(map(str, k)) for k in absent[:8]])
            print(
                f"Pretrained network {what}: keeping init values for "
                f"{len(absent)} param(s) the checkpoint does not carry "
                f"(e.g. {'.'.join(map(str, absent[0]))})"
            )
            flat_p, flat_s = merge_init()
    if not missing and leftover:
        print(
            f"Pretrained network {what} has excessive layers; "
            "Only loading layers that are used"
        )
    return (
        traverse.unflatten_dict(flat_p) if flat_p else {},
        traverse.unflatten_dict(flat_s) if flat_s else {},
    )


def import_generator(
    state_dict: Dict[str, Any],
    gen,
    *,
    param_key_map: Optional[Dict[str, str]] = None,
    init_vars: Optional[Dict] = None,
) -> Tuple[Dict, Dict]:
    """torch G state_dict -> (params, batch_stats) pytrees for our module.

    ``init_vars`` (a ``{"params", "batch_stats"}`` template from
    ``Module.init``) enables the reference's fuzzy fallback ladder; without
    it any missing key raises.  Extra torch keys are dropped with a warning
    either way (reference base_model.py:67-70)."""
    entries = generator_entries_for(gen)
    return _fuzzy_import(
        state_dict, entries, "G", param_key_map,
        None if init_vars is None else init_vars.get("params"),
        None if init_vars is None else init_vars.get("batch_stats", {}),
    )


def import_discriminator(
    state_dict: Dict[str, Any],
    num_d: int,
    n_layers: int,
    *,
    param_key_map: Optional[Dict[str, str]] = None,
    init_params: Optional[Dict] = None,
) -> Dict:
    entries = discriminator_entries(num_d, n_layers)
    params, _ = _fuzzy_import(
        state_dict, entries, "D", param_key_map, init_params, None
    )
    return params


def export_to_torch_keys(params: Dict, batch_stats: Dict, entries: List[Entry]) -> Dict[str, np.ndarray]:
    """Inverse mapping (for round-trip tests and torch interop)."""
    flat_p = traverse.flatten_dict(params)
    flat_s = traverse.flatten_dict(batch_stats) if batch_stats else {}
    out: Dict[str, np.ndarray] = {}
    for prefix, path, kind in entries:
        if kind in ("conv", "convT"):
            w = np.asarray(flat_p[path + ("kernel",)])
            out[f"{prefix}.weight"] = np.transpose(w, (3, 2, 0, 1))
            if path + ("bias",) in flat_p:
                out[f"{prefix}.bias"] = np.asarray(flat_p[path + ("bias",)])
        elif kind == "bn":
            out[f"{prefix}.weight"] = np.asarray(flat_p[path + ("scale",)])
            out[f"{prefix}.bias"] = np.asarray(flat_p[path + ("bias",)])
            out[f"{prefix}.running_mean"] = np.asarray(flat_s[path + ("mean",)])
            out[f"{prefix}.running_var"] = np.asarray(flat_s[path + ("var",)])
        elif kind == "posemb":
            out[f"{prefix}.height"] = np.asarray(flat_p[path + ("height",)])
            out[f"{prefix}.width"] = np.asarray(flat_p[path + ("width",)])
    return out


def load_pth(path: str) -> Dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)
