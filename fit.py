#!/usr/bin/env python
"""Joints -> SMPL parameter fitting (the SMPLify tool).

Reimplements the role of the reference `fit.py` + `mld/transforms/joints2rots/
smplify.py` (SMPLify3D): given generated joint sequences, optimize SMPL
(global_orient, body_pose, betas, transl) so the model's joints match — used
to render generated joint motions as meshes. The optimizer is optax Adam over
the fully differentiable `smpl_joints24` forward (the reference uses torch
LBFGS/Adam over the smplx module), with the standard regularizers: an
angle prior on knees/elbows (bend direction), the MaxMixturePrior GMM pose
prior (`mld/transforms/joints2rots/prior.py`; --gmm points at the gmm_08.pkl
asset, standard-normal fallback otherwise), and a betas prior.
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# knees and elbows bend one way: penalize exp of the wrong-sign angle
# (customloss.py angle_prior: joints 4, 7? reference uses pose indices
# [55-3, 58-3, 12-3, 15-3] on the 69-d body pose == elbows/knees)
ANGLE_PRIOR_IDX = np.array([52, 55, 9, 12])  # indices into the 69-d body pose
ANGLE_PRIOR_SIGN = np.array([-1.0, 1.0, -1.0, -1.0], np.float32)


def smplify_losses(joints_pred, joints_target, body_pose, betas,
                   w_joints=1.0, w_pose=1e-3, w_angle=1e-2, w_betas=1e-3,
                   pose_prior=None):
    loss_joints = jnp.mean(jnp.sum((joints_pred - joints_target) ** 2, axis=-1))
    if pose_prior is not None:
        loss_pose = jnp.mean(pose_prior(body_pose))
    else:
        loss_pose = jnp.mean(body_pose**2)
    bend = body_pose[..., ANGLE_PRIOR_IDX] * ANGLE_PRIOR_SIGN
    loss_angle = jnp.mean(jnp.exp(bend) ** 2)
    loss_betas = jnp.mean(betas**2)
    return (
        w_joints * loss_joints + w_pose * loss_pose
        + w_angle * loss_angle + w_betas * loss_betas,
        {"joints": loss_joints, "pose": loss_pose, "angle": loss_angle, "betas": loss_betas},
    )


def fit_smpl_to_joints(
    smpl,
    joints_target: jnp.ndarray,   # (N, 24, 3)
    num_steps: int = 300,
    lr: float = 0.02,
    shared_betas: bool = True,
    pose_prior=None,
) -> Tuple[Dict, Dict]:
    """Returns (fitted params dict, final loss terms)."""
    import optax

    from seeme_tpu.core.smpl import smpl_joints24

    N = joints_target.shape[0]
    params = {
        "global_orient": jnp.zeros((N, 3)),
        "body_pose": jnp.zeros((N, 69)),
        "betas": jnp.zeros((1 if shared_betas else N, 10)),
        "transl": jnp.asarray(joints_target[:, 0]),  # init at target pelvis
    }

    def loss_fn(p):
        betas = jnp.broadcast_to(p["betas"], (N, 10))
        joints = smpl_joints24(smpl, betas, p["body_pose"], p["global_orient"], p["transl"])
        return smplify_losses(joints, joints_target, p["body_pose"], betas,
                              pose_prior=pose_prior)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss, terms

    for i in range(num_steps):
        params, opt_state, loss, terms = step(params, opt_state)
    return params, {k: float(v) for k, v in terms.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--joints", required=True, help="(T, J>=24, 3) npy file")
    ap.add_argument("--smpl_path", default="./deps/smpl_models/smpl/SMPL_NEUTRAL.pkl")
    ap.add_argument("--out", default="fitted_smpl.npz")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--gmm", default="./deps/joints2rots/smpl_prior",
                    help="dir or pkl with the MaxMixturePrior GMM "
                         "(gmm_08.pkl); standard-normal fallback when absent")
    ap.add_argument("--save_mesh", default=None,
                    help="also write a (T, V, 3) vertex npy of the fitted "
                         "body (the reference's joints -> *_mesh.npy role) "
                         "for render.py --mesh")
    ap.add_argument("--cpu", action="store_true",
                    help="force the host CPU backend (first jit through the "
                         "axon tunnel is slow)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import os

    from seeme_tpu.core.smpl import load_smpl, synthetic_smpl

    smpl = (
        load_smpl(args.smpl_path)
        if os.path.exists(args.smpl_path)
        else synthetic_smpl(n_verts=6890)
    )
    from seeme_tpu.core.pose_prior import MaxMixturePrior

    prior = MaxMixturePrior(args.gmm)
    if prior.is_fallback:
        print("no GMM asset — standard-normal pose prior")
    joints = jnp.asarray(np.load(args.joints))[:, :24]
    params, terms = fit_smpl_to_joints(smpl, joints, num_steps=args.steps,
                                       pose_prior=prior)
    np.savez(args.out, **{k: np.asarray(v) for k, v in params.items()})
    print(f"fitted {joints.shape[0]} frames -> {args.out}; final terms: {terms}")

    if args.save_mesh:
        from seeme_tpu.core.smpl import smpl_forward

        N = params["body_pose"].shape[0]
        fk = smpl_forward(
            smpl, jnp.broadcast_to(params["betas"], (N, 10)),
            params["body_pose"], params["global_orient"],
            params.get("transl"),
        )
        np.save(args.save_mesh, np.asarray(fk["vertices"]))
        faces_path = os.path.splitext(args.save_mesh)[0] + "_faces.npy"
        np.save(faces_path, smpl.faces)
        print(f"wrote mesh {args.save_mesh} (+{faces_path})")


if __name__ == "__main__":
    main()
