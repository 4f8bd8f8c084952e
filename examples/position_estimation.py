"""Position-estimation toy experiment
(python-examples/position-estimation-toy-experiment/).

The reference renders compound-eye views at random arena poses, then trains a
3-layer MLP (features -> 1000 -> 256 -> 3, ReLU, L1 loss, SGD:
position-estimator-file-based.py:178-203) to regress the camera position from
the view — a scientific end-to-end check: if rendered views are wrong, the
learning curves diverge.

This version is TPU-native end to end: view generation uses the compound
pipeline and the estimator is a JAX/optax MLP with the same architecture and
loss.  Dataset generation and training both run in a single process.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from compound_ray_tpu.api.renderer import EyeRenderer
from compound_ray_tpu.cameras.types import CompoundEyeCamera
from compound_ray_tpu.testing import make_big_scene, make_sphere_eye


def generate_views(renderer, n_views, bounds_lo, bounds_hi, samples, seed=0):
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for i in range(n_views):
        pos = rng.uniform(bounds_lo, bounds_hi)
        yaw = rng.uniform(0, 2 * np.pi)
        renderer.set_camera_pose(pos[0], pos[1], pos[2], 0.0, yaw, 0.0)
        renderer.render_frame()
        view = renderer.get_camera_data().reshape(-1)  # (n_omms*3,)
        xs.append(view)
        ys.append(pos)
        if (i + 1) % 50 == 0:
            print(f"  generated {i + 1}/{n_views} views")
    return np.stack(xs).astype(np.float32), np.stack(ys).astype(np.float32)


def init_mlp(key, feature_size):
    k1, k2, k3 = jax.random.split(key, 3)

    def layer(k, n_in, n_out):
        w = jax.random.normal(k, (n_in, n_out)) * jnp.sqrt(2.0 / n_in)
        return {"w": w, "b": jnp.zeros(n_out)}

    return {
        "fc1": layer(k1, feature_size, 1000),
        "fc2": layer(k2, 1000, 256),
        "fc3": layer(k3, 256, 3),
    }


def forward(params, x):
    x = jax.nn.relu(x @ params["fc1"]["w"] + params["fc1"]["b"])
    x = jax.nn.relu(x @ params["fc2"]["w"] + params["fc2"]["b"])
    return x @ params["fc3"]["w"] + params["fc3"]["b"]


def train(xs, ys, epochs=50, batch=32, lr=1e-3, seed=0):
    n = len(xs)
    split = int(0.8 * n)
    x_tr, y_tr = jnp.asarray(xs[:split]), jnp.asarray(ys[:split])
    x_te, y_te = jnp.asarray(xs[split:]), jnp.asarray(ys[split:])

    params = init_mlp(jax.random.PRNGKey(seed), xs.shape[1])
    opt = optax.sgd(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            return jnp.mean(jnp.abs(forward(p, xb) - yb))  # L1

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_loss(params):
        return jnp.mean(jnp.abs(forward(params, x_te) - y_te))

    rng = np.random.default_rng(seed)
    train_curve, test_curve = [], []
    for epoch in range(epochs):
        order = rng.permutation(split)
        losses = []
        for b0 in range(0, split - batch + 1, batch):
            idx = order[b0:b0 + batch]
            params, opt_state, loss = step(
                params, opt_state, x_tr[idx], y_tr[idx]
            )
            losses.append(float(loss))
        tr = float(np.mean(losses))
        te = float(eval_loss(params))
        train_curve.append(tr)
        test_curve.append(te)
        print(f"epoch {epoch + 1}: train L1 {tr:.4f}, test L1 {te:.4f}")
    return params, train_curve, test_curve


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", "--views", type=int, default=300)
    ap.add_argument("-o", "--ommatidia", type=int, default=200)
    ap.add_argument("-s", "--samples", type=int, default=8)
    ap.add_argument("-e", "--epochs", type=int, default=50)
    ap.add_argument("--out", default="position-estimation-results.npz")
    args = ap.parse_args(argv)

    print("Building arena scene + eye...")
    r = EyeRenderer(verbose=False)
    r.scene = make_big_scene(n_boxes=100, seed=7)
    cam = CompoundEyeCamera(
        "bee-eye", "single_dimension_fast",
        make_sphere_eye(args.ommatidia, acceptance_deg=5.0),
    )
    r.scene.cameras.append(cam)
    from compound_ray_tpu.trace.lighting import default_lights

    r._lights = default_lights(r.scene.aabb_min, r.scene.aabb_max)
    r.set_current_eye_samples_per_ommatidium(args.samples)

    lo = np.array([-30.0, 1.0, -30.0])
    hi = np.array([30.0, 8.0, 30.0])
    print(f"Generating {args.views} views...")
    xs, ys = generate_views(r, args.views, lo, hi, args.samples)

    print("Training estimator...")
    params, train_curve, test_curve = train(xs, ys, epochs=args.epochs)
    np.savez(args.out, train=np.asarray(train_curve),
             test=np.asarray(test_curve))
    print(f"Saved learning curves to {args.out}; "
          f"final test L1 {test_curve[-1]:.4f} "
          f"(arena span ~{float(np.linalg.norm(hi - lo)):.1f})")


if __name__ == "__main__":
    main()
