"""Parameter freezing as optimizer masking (the JAX-idiomatic equivalent of
the reference's requires_grad toggles: networks.py:269-298 ``set_freeze`` and
pix2pixHD_model.py:331-343 ``--niter_fix_global``)."""

from __future__ import annotations

from typing import Any, Dict

import flax.traverse_util as traverse
import optax


# The reference freezes by layer class (networks.py:271-283): freeze_global_d
# toggles every Conv2d/ConvResBlock — the stem, the downsample convs, AND the
# final head conv — while freeze_global_u toggles the upsample/resblock/attn
# classes.  "head" therefore belongs to the down group, not the up group.
_GLOBAL_DOWN = ("stem", "down", "head")
_GLOBAL_UP = ("res", "attn", "up")


def param_labels(
    params: Dict[str, Any],
    freeze_g_d: bool = False,
    freeze_g_u: bool = False,
    freeze_l_d: bool = False,
    freeze_l_u: bool = False,
    fix_global: bool = False,
) -> Dict[str, Any]:
    """Label every param 'train' or 'frozen'.

    Path conventions (see models/generator.py): a LocalEnhancer has a
    ``global`` subtree plus ``local_*`` top-level modules; a bare
    GlobalGenerator has ``stem``/``down*``/``res*``/``attn``/``up*``/``head``.

    ``fix_global`` freezes everything except the local enhancer branch
    (pix2pixHD_model.py:331-343: only params starting with 'model1').
    """
    flat = traverse.flatten_dict(params)

    def label(path) -> str:
        parts = tuple(str(p) for p in path)
        # enhancer-branch modules are 'local_*' (finest branch) or
        # 'enh{n}_local_*' (intermediate branches when n_local_enhancers > 1)
        is_local = "local" in parts[0]
        if fix_global and not is_local:
            return "frozen"
        if is_local:
            # The reference does NOT apply the class rule to the enhancer:
            # freeze_local_d freezes ALL of model1_1 (the ReflectionPad/7x7
            # stem + one downsample conv) and freeze_local_u freezes ALL of
            # model1_2 — resblocks, attention downs, upsamples AND the tanh
            # head (networks.py:286-298 iterate whole Sequentials).  So only
            # local_stem/local_down are 'down'; local_head and
            # local_attn_down* belong to the up group.
            down = parts[0].endswith(("local_stem", "local_down"))
            if down and freeze_l_d:
                return "frozen"
            if not down and freeze_l_u:
                return "frozen"
            return "train"
        # global subtree: either nested under 'global' or at top level
        sub = parts[1] if parts[0] == "global" else parts[0]
        if sub.startswith(_GLOBAL_DOWN) and freeze_g_d:
            return "frozen"
        if sub.startswith(_GLOBAL_UP) and freeze_g_u:
            return "frozen"
        return "train"

    return traverse.unflatten_dict({k: label(k) for k in flat})


def masked_optimizer(
    tx: optax.GradientTransformation, labels
) -> optax.GradientTransformation:
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels
    )
