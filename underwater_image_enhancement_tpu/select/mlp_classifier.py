"""Flax MLP strategy classifier — a TPU-resident alternative to sklearn.

Same sklearn-ish surface (fit / predict / predict_proba / classes_) so
SelfSupervisedSystem can pickle and serve it interchangeably with the
RF/GB/SVM classifiers.  The tabular problem is tiny (79-dim, O(1000) rows),
so this exists for deployments that want the whole pipeline on-device.
"""

from __future__ import annotations

import numpy as np


class FlaxMLPClassifier:
    def __init__(self, hidden_dim: int = 128, epochs: int = 200,
                 lr: float = 1e-3, seed: int = 0):
        self.hidden_dim = hidden_dim
        self.epochs = epochs
        self.lr = lr
        self.seed = seed
        self.classes_: np.ndarray = np.array([])
        self._params = None

    def _model(self, n_classes: int):
        import flax.linen as nn

        hidden = self.hidden_dim

        class Net(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(hidden)(x)
                x = nn.relu(x)
                x = nn.Dense(hidden)(x)
                x = nn.relu(x)
                return nn.Dense(n_classes)(x)

        return Net()

    def fit(self, X: np.ndarray, y: np.ndarray) -> "FlaxMLPClassifier":
        import jax
        import jax.numpy as jnp
        import optax

        self.classes_ = np.array(sorted(set(y)))
        idx = {c: i for i, c in enumerate(self.classes_)}
        labels = jnp.asarray(np.array([idx[c] for c in y], np.int32))
        Xj = jnp.asarray(np.asarray(X, np.float32))
        model = self._model(len(self.classes_))
        params = model.init(jax.random.PRNGKey(self.seed), Xj[:1])
        tx = optax.adam(self.lr)
        opt = tx.init(params)

        def loss_fn(p):
            logits = model.apply(p, Xj)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        @jax.jit
        def step(p, o):
            l, g = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(g, o)
            return optax.apply_updates(p, up), o, l

        for _ in range(self.epochs):
            params, opt, _ = step(params, opt)
        self._params = jax.tree.map(np.asarray, params)  # picklable
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        model = self._model(len(self.classes_))
        logits = model.apply(self._params, jnp.asarray(np.asarray(X, np.float32)))
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self.classes_[np.argmax(self.predict_proba(X), axis=1)]
