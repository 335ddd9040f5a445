"""RealNVP normalizing flow for RLE losses.

Rebuilds the reference flow
(``opera/models/dense_heads/videopose_head_mul_frames.py:1538-1601``): six
2-d affine coupling layers with alternating masks, scale nets
``2->64->64->2`` (LeakyReLU, Tanh output) and translation nets without the
Tanh; prior is an isotropic normal centered at ``(0.5, 0.5)``.  The head owns
three independent flows (``enc_flow``/``dec_flow``/``flow``).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


class _CouplingNet(nn.Module):
    tanh_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.xavier_uniform()
        x = nn.leaky_relu(nn.Dense(64, dtype=self.dtype, kernel_init=init)(x),
                          negative_slope=0.01)
        x = nn.leaky_relu(nn.Dense(64, dtype=self.dtype, kernel_init=init)(x),
                          negative_slope=0.01)
        x = nn.Dense(2, dtype=self.dtype, kernel_init=init)(x)
        return jnp.tanh(x) if self.tanh_out else x


class RealNVP(nn.Module):
    """log_prob over 2-d residuals."""
    num_coupling: int = 6
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # masks alternate [0,1],[1,0] (reference ``:344``)
        self.masks = jnp.asarray(
            [[0.0, 1.0], [1.0, 0.0]] * (self.num_coupling // 2),
            dtype=self.dtype)
        self.s_nets = [_CouplingNet(tanh_out=True, dtype=self.dtype,
                                    name=f"s{i}")
                       for i in range(self.num_coupling)]
        self.t_nets = [_CouplingNet(tanh_out=False, dtype=self.dtype,
                                    name=f"t{i}")
                       for i in range(self.num_coupling)]

    def backward_p(self, x):
        """x (N, 2) -> (z (N, 2), log_det (N,))."""
        log_det = jnp.zeros(x.shape[:-1], self.dtype)
        z = x
        for i in reversed(range(self.num_coupling)):
            m = self.masks[i]
            z_ = m * z
            s = self.s_nets[i](z_) * (1 - m)
            t = self.t_nets[i](z_) * (1 - m)
            z = (1 - m) * (z - t) * jnp.exp(-s) + z_
            log_det = log_det - s.sum(-1)
        return z, log_det

    def __call__(self, x):
        return self.log_prob(x)

    def log_prob(self, x):
        """x (..., 2) -> log prob (...,). Prior N((.5,.5), I)."""
        z, log_det = self.backward_p(x)
        d = z - 0.5
        prior_logp = (-0.5 * (d ** 2).sum(-1)
                      - jnp.asarray(math.log(2 * math.pi), self.dtype))
        return prior_logp + log_det
