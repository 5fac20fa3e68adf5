"""Load reference torch checkpoints (.pth state dicts) into framework params.

A user of the reference has trained weights saved as three-part state dicts
(``{prefix}{enc,ode,dec}.pth``, reference ``lib/VAE.py:308-315``).  This
module converts them into :class:`UDEForecasterParams`, so existing models
migrate without retraining.  Key layouts handled (reference modules):

* ``Encoder_Back_GRU``: ``rnn_layers.{i}.weight_ih_l0/weight_hh_l0/bias_*``,
  ``ff_layers.{i}.weight/bias`` (Linear indices interleaved with ReLU)
  (``lib/models.py:69-86``)
* ``Fp``: ``Fp_net.{i}.weight/bias`` (Flatten/ELU interleaved)
  (``lib/models.py:118-124``)
* ``Fa``: ``aug_net.{i}.*`` (``:167-172``)
* ``FaFp``: ``net.{i}.*`` + ``aug_net.{i}.*`` (``:208-223``)
* ``Bayes_*``: ``*.{i}.w_mean/w_std/b_mean/b_std`` (``models_bayes.py:19-25``)
* ``Decoder``: ``decoder.1.weight/bias`` (``lib/models.py:37-39``)

Torch tensors are transposed into this framework's (in, out) layout.
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np

import jax.numpy as jnp

from fiude_tpu.models.nn import Dense
from fiude_tpu.ops.gru import GRUParams


def _to_np(state_dict) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v) for k, v in state_dict.items()}


def _collect_linears(sd: Dict[str, np.ndarray], prefix: str) -> List[Dense]:
    """Gather Linear layers ``{prefix}.{i}.weight/bias`` in index order."""
    idxs = sorted({int(m.group(1))
                   for k in sd
                   if (m := re.fullmatch(rf"{re.escape(prefix)}\.(\d+)\.weight", k))})
    return [Dense(w=jnp.asarray(sd[f"{prefix}.{i}.weight"].T),
                  b=jnp.asarray(sd[f"{prefix}.{i}.bias"]))
            for i in idxs]


def _collect_variational(sd: Dict[str, np.ndarray], prefix: str):
    from fiude_tpu.models.bayes import DenseVariationalParams
    idxs = sorted({int(m.group(1))
                   for k in sd
                   if (m := re.fullmatch(rf"{re.escape(prefix)}\.(\d+)\.w_mean", k))})
    return [DenseVariationalParams(
        w_mean=jnp.asarray(sd[f"{prefix}.{i}.w_mean"].T),
        w_std=jnp.asarray(sd[f"{prefix}.{i}.w_std"].T),
        b_mean=jnp.asarray(sd[f"{prefix}.{i}.b_mean"]),
        b_std=jnp.asarray(sd[f"{prefix}.{i}.b_std"]))
        for i in idxs]


def _collect_grus(sd: Dict[str, np.ndarray], prefix: str) -> List[GRUParams]:
    idxs = sorted({int(m.group(1))
                   for k in sd
                   if (m := re.fullmatch(
                       rf"{re.escape(prefix)}\.(\d+)\.weight_ih_l0", k))})
    return [GRUParams(
        w_ih=jnp.asarray(sd[f"{prefix}.{i}.weight_ih_l0"].T),
        w_hh=jnp.asarray(sd[f"{prefix}.{i}.weight_hh_l0"].T),
        b_ih=jnp.asarray(sd[f"{prefix}.{i}.bias_ih_l0"]),
        b_hh=jnp.asarray(sd[f"{prefix}.{i}.bias_hh_l0"]))
        for i in idxs]


def encoder_params_from_torch(state_dict) -> "BackGRUEncoderParams":
    from fiude_tpu.models.encoders import BackGRUEncoderParams
    sd = _to_np(state_dict)
    return BackGRUEncoderParams(
        grus=tuple(_collect_grus(sd, "rnn_layers")),
        ff=tuple(_collect_linears(sd, "ff_layers")),
    )


def ode_params_from_torch(state_dict, ode_name: str):
    from fiude_tpu.models.bayes import (
        BayesNeuralAugParams, BayesSIRRatesParams, BayesUDEParams,
    )
    from fiude_tpu.models.rhs import (
        NeuralAugParams, SIRRatesParams, UDEParams,
    )
    sd = _to_np(state_dict)
    is_bayes = any(k.endswith("w_mean") for k in sd)
    collect = _collect_variational if is_bayes else _collect_linears

    if ode_name in ("Fp", "CONN", "CONNb"):
        net = collect(sd, "Fp_net")
        cls = BayesSIRRatesParams if is_bayes else SIRRatesParams
        return cls(fp_net=tuple(net))
    if ode_name in ("Fa", "SONN", "SONNb"):
        net = collect(sd, "aug_net")
        cls = BayesNeuralAugParams if is_bayes else NeuralAugParams
        return cls(aug_net=tuple(net))
    # FaFp: the non-Bayes reference names the rates net "net", the Bayes one
    # "Fp_net" (models_bayes.py:194)
    fp_prefix = "Fp_net" if any(k.startswith("Fp_net") for k in sd) else "net"
    fp = collect(sd, fp_prefix)
    aug = collect(sd, "aug_net")
    cls = BayesUDEParams if is_bayes else UDEParams
    return cls(fp_net=tuple(fp), aug_net=tuple(aug))


def decoder_params_from_torch(state_dict) -> "LinearDecoderParams":
    from fiude_tpu.models.decoder import LinearDecoderParams
    sd = _to_np(state_dict)
    (dense,) = _collect_linears(sd, "decoder")
    return LinearDecoderParams(out=dense)


def params_from_torch_checkpoint(prefix: str, ode_name: str):
    """Load ``{prefix}{enc,ode,dec}.pth`` into UDEForecasterParams."""
    import torch

    from fiude_tpu.models.vae import UDEForecasterParams

    load = lambda p: torch.load(p, map_location="cpu", weights_only=True)
    return UDEForecasterParams(
        enc=encoder_params_from_torch(load(f"{prefix}enc.pth")),
        ode=ode_params_from_torch(load(f"{prefix}ode.pth"), ode_name),
        dec=decoder_params_from_torch(load(f"{prefix}dec.pth")),
    )
