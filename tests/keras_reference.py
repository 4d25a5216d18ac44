"""Keras re-statement of the reference notebook's model zoo, used ONLY as a
test oracle: it reproduces the *behavior* and *checkpoint layout* of
``Test Notebooks/conv-squeezeformer-conformer-test.ipynb`` cells 5+7 (and the
conv-hybrid/conv-transformer families) so the full-model weight-import parity
gate can random-init a reference-architecture model, save a legacy .h5, import
it with :func:`ishara_tpu.serve.import_weights.import_reference_h5`, and diff
logits end-to-end.

Two properties of the original are part of the contract and deliberately
preserved here:

* numerical semantics (layer math, reference quirks: full-dim attention
  scale, shared ``layer_norm1`` in the ConformerBlock, default-eps norms in
  its ConvolutionModule, no activation after its BN, causal DW convs,
  masked GAP in ECA/SE);
* sublayer *creation order*, which fixes the legacy-h5 weight order that
  ``keras_weight_spec`` mirrors.
"""

from __future__ import annotations

import numpy as np
import tensorflow as tf

K = tf.keras


def positional_encoding(maxlen: int, dim: int) -> np.ndarray:
    depth = dim / 2
    pos = np.arange(maxlen, dtype=np.float32)[:, None]
    depths = np.arange(depth, dtype=np.float32)[None, :] / depth
    rads = pos * (1.0 / np.power(10000.0, depths).astype(np.float32))
    return np.concatenate([np.sin(rads), np.cos(rads)], axis=-1)


def _masked_gap(x, mask):
    """Keras GlobalAveragePooling1D(inputs, mask=mask) semantics."""
    if mask is None:
        return tf.reduce_mean(x, axis=1)
    m = tf.cast(mask, x.dtype)[..., None]
    return tf.reduce_sum(x * m, axis=1) / tf.maximum(tf.reduce_sum(m, axis=1), 1e-9)


class Eca(K.layers.Layer):
    def __init__(self, kernel_size=5, **kw):
        super().__init__(**kw)
        self.supports_masking = True
        self.kernel_size = kernel_size
        self.conv = K.layers.Conv1D(1, kernel_size, padding="same", use_bias=False)

    def call(self, inputs, mask=None):
        g = _masked_gap(inputs, mask)
        g = self.conv(g[..., None])[..., 0]
        return inputs * tf.nn.sigmoid(g)[:, None, :]

    def get_config(self):
        return {**super().get_config(), "kernel_size": self.kernel_size}


class SqueezeExcite(K.layers.Layer):
    def __init__(self, channels, reduction_ratio=8, **kw):
        super().__init__(**kw)
        self.supports_masking = True
        self.channels, self.reduction_ratio = channels, reduction_ratio
        self.fc1 = K.layers.Dense(max(1, channels // reduction_ratio),
                                  activation="swish")
        self.fc2 = K.layers.Dense(channels, activation="sigmoid")

    def call(self, inputs, mask=None):
        g = self.fc2(self.fc1(_masked_gap(inputs, mask)))
        return inputs * g[:, None, :]

    def get_config(self):
        return {**super().get_config(), "channels": self.channels,
                "reduction_ratio": self.reduction_ratio}


class CausalDw(K.layers.Layer):
    """Left-pad (k-1)*dilation then VALID depthwise conv."""

    def __init__(self, kernel_size=17, dilation_rate=1, use_bias=False, **kw):
        super().__init__(**kw)
        self.supports_masking = True
        self.kernel_size, self.dilation_rate = kernel_size, dilation_rate
        self.use_bias = use_bias
        self.dw = K.layers.DepthwiseConv1D(
            kernel_size, dilation_rate=dilation_rate, padding="valid",
            use_bias=use_bias)

    def call(self, inputs):
        pad = self.dilation_rate * (self.kernel_size - 1)
        return self.dw(tf.pad(inputs, [[0, 0], [pad, 0], [0, 0]]))

    def get_config(self):
        return {**super().get_config(), "kernel_size": self.kernel_size,
                "dilation_rate": self.dilation_rate, "use_bias": self.use_bias}


class Mhsa(K.layers.Layer):
    """Fused-QKV attention; score scale = dim**-0.5 over the FULL model dim
    (reference quirk)."""

    def __init__(self, dim=256, num_heads=4, dropout=0.0, **kw):
        super().__init__(**kw)
        self.supports_masking = True
        self.dim, self.num_heads, self.dropout_rate = dim, num_heads, dropout
        self.qkv = K.layers.Dense(3 * dim, use_bias=False)
        self.drop = K.layers.Dropout(dropout)
        self.proj = K.layers.Dense(dim, use_bias=False)

    def call(self, inputs, mask=None):
        b = tf.shape(inputs)[0]
        t = tf.shape(inputs)[1]
        dh = self.dim // self.num_heads
        qkv = tf.reshape(self.qkv(inputs), (b, t, self.num_heads, 3 * dh))
        qkv = tf.transpose(qkv, (0, 2, 1, 3))
        q, k, v = tf.split(qkv, 3, axis=-1)
        attn = tf.matmul(q, k, transpose_b=True) * (self.dim ** -0.5)
        if mask is not None:
            attn += (1.0 - tf.cast(mask, attn.dtype))[:, None, None, :] * -1e9
        attn = self.drop(tf.nn.softmax(attn, axis=-1))
        out = tf.transpose(attn @ v, (0, 2, 1, 3))
        return self.proj(tf.reshape(out, (b, t, self.dim)))

    def get_config(self):
        return {**super().get_config(), "dim": self.dim,
                "num_heads": self.num_heads, "dropout": self.dropout_rate}


def _ffn(dim, expansion_factor, dropout):
    return K.Sequential([
        K.layers.Dense(dim * expansion_factor, activation="swish"),
        K.layers.Dropout(dropout),
        K.layers.Dense(dim),
    ])


class SqueezeConvModule(K.layers.Layer):
    """LN -> pw(dim*exp) swish -> causal DW swish -> pw(dim) -> SE -> +res."""

    def __init__(self, dim, kernel_size, expansion_factor=2, **kw):
        super().__init__(**kw)
        self.supports_masking = True
        self.dim, self.kernel_size = dim, kernel_size
        self.expansion_factor = expansion_factor
        self.norm = K.layers.LayerNormalization(epsilon=1e-6)
        self.pw1 = K.layers.Conv1D(dim * expansion_factor, 1)
        self.dw = CausalDw(kernel_size=kernel_size)
        self.pw2 = K.layers.Conv1D(dim, 1)
        self.se = SqueezeExcite(dim)

    def call(self, inputs, mask=None):
        x = self.norm(inputs)
        x = tf.nn.silu(self.pw1(x))
        x = tf.nn.silu(self.dw(x))
        x = self.pw2(x)
        return self.se(x, mask=mask) + inputs

    def get_config(self):
        return {**super().get_config(), "dim": self.dim,
                "kernel_size": self.kernel_size,
                "expansion_factor": self.expansion_factor}


class SqueezeformerBlock(K.layers.Layer):
    def __init__(self, dim, num_heads=8, expansion_factor=4, kernel_size=31,
                 dropout=0.1, **kw):
        super().__init__(**kw)
        self.supports_masking = True
        self._cfg = dict(dim=dim, num_heads=num_heads,
                         expansion_factor=expansion_factor,
                         kernel_size=kernel_size, dropout=dropout)
        self.norm1 = K.layers.LayerNormalization(epsilon=1e-6)
        self.ffn1 = _ffn(dim, expansion_factor, dropout)
        self.norm2 = K.layers.LayerNormalization(epsilon=1e-6)
        self.mha = Mhsa(dim=dim, num_heads=num_heads, dropout=dropout)
        self.conv = SqueezeConvModule(dim, kernel_size, expansion_factor)
        self.norm3 = K.layers.LayerNormalization(epsilon=1e-6)
        self.ffn2 = _ffn(dim, expansion_factor, dropout)
        self.drop = K.layers.Dropout(dropout)

    def call(self, inputs, mask=None):
        x = inputs + self.drop(self.ffn1(self.norm1(inputs)))
        x = x + self.drop(self.mha(self.norm2(x), mask=mask))
        x = self.conv(x, mask=mask)
        return x + self.drop(self.ffn2(self.norm3(x)))

    def get_config(self):
        return {**super().get_config(), **self._cfg}


class ConformerFfn(K.layers.Layer):
    def __init__(self, dim, expansion_factor=4, dropout=0.1, **kw):
        super().__init__(**kw)
        self.supports_masking = True
        self._cfg = dict(dim=dim, expansion_factor=expansion_factor,
                         dropout=dropout)
        self.seq = _ffn(dim, expansion_factor, dropout)

    def call(self, x, training=None):
        return self.seq(x, training=training)

    def get_config(self):
        return {**super().get_config(), **self._cfg}


class ConformerConvModule(K.layers.Layer):
    """pw(2*dim) -> GLU -> 'same' grouped DW -> BN -> pw(dim) -> LN(x+res).
    Norms use Keras DEFAULTS (eps 1e-3, BN momentum 0.99) — reference quirk."""

    def __init__(self, dim, kernel_size=31, **kw):
        super().__init__(**kw)
        self.supports_masking = True
        self.dim, self.kernel_size = dim, kernel_size
        self.pw1 = K.layers.Conv1D(dim * 2, 1)
        self.dw = K.layers.Conv1D(dim, kernel_size, padding="same", groups=dim)
        self.pw2 = K.layers.Conv1D(dim, 1)
        self.bn = K.layers.BatchNormalization()
        self.ln = K.layers.LayerNormalization()

    def call(self, x, training=None):
        res = x
        a, b = tf.split(self.pw1(x), 2, axis=-1)
        x = a * tf.sigmoid(b)
        x = self.bn(self.dw(x), training=training)
        x = self.pw2(x)
        return self.ln(x + res)

    def get_config(self):
        return {**super().get_config(), "dim": self.dim,
                "kernel_size": self.kernel_size}


class ConformerBlock(K.layers.Layer):
    """FFN -> MHSA -> conv -> FFN; ``ln1`` is shared by the FFN1 and MHSA
    pre-norms (reference quirk), and the norms are created LAST (fixes the
    checkpoint weight order)."""

    def __init__(self, dim, num_heads=8, expand=4, kernel_size=31,
                 attn_dropout=0.1, drop_rate=0.1, **kw):
        super().__init__(**kw)
        self.supports_masking = True
        self._cfg = dict(dim=dim, num_heads=num_heads, expand=expand,
                         kernel_size=kernel_size, attn_dropout=attn_dropout,
                         drop_rate=drop_rate)
        self.ffn1 = ConformerFfn(dim, expand, drop_rate)
        self.mha = Mhsa(dim=dim, num_heads=num_heads, dropout=attn_dropout)
        self.conv = ConformerConvModule(dim, kernel_size)
        self.ffn2 = ConformerFfn(dim, expand, drop_rate)
        self.ln1 = K.layers.LayerNormalization(epsilon=1e-6)
        self.ln2 = K.layers.LayerNormalization(epsilon=1e-6)

    def call(self, x, training=None, mask=None):
        x = x + self.ffn1(self.ln1(x), training=training)
        x = x + self.mha(self.ln1(x), mask=mask)
        x = self.conv(x, training=training)
        return x + self.ffn2(self.ln2(x), training=training)

    def get_config(self):
        return {**super().get_config(), **self._cfg}


def conv1d_block(x, mask, channels, kernel_size, dilation_rate=1,
                 drop_rate=0.0, expand_ratio=2):
    """Functional MBConv-style block (five top-level layers, like the
    reference's functional ``Conv1DBlock``)."""
    channels_in = x.shape[-1]
    skip = x
    x = K.layers.Dense(channels_in * expand_ratio, use_bias=True,
                       activation="swish")(x)
    x = CausalDw(kernel_size, dilation_rate, use_bias=False)(x)
    x = K.layers.BatchNormalization(momentum=0.95)(x)
    x = Eca()(x, mask=mask)
    x = K.layers.Dense(channels, use_bias=True)(x)
    if drop_rate > 0:
        x = K.layers.Dropout(drop_rate, noise_shape=(None, 1, 1))(x)
    if channels_in == channels:
        x = K.layers.add([x, skip])
    return x


def transformer_block(x, mask, dim=256, num_heads=6, expand=4,
                      attn_dropout=0.2, drop_rate=0.2):
    """Functional pre-LN MHSA + biasless FFN block."""
    h = K.layers.LayerNormalization(epsilon=1e-6)(x)
    h = Mhsa(dim=dim, num_heads=num_heads, dropout=attn_dropout)(h, mask=mask)
    h = K.layers.Dropout(drop_rate, noise_shape=(None, 1, 1))(h)
    x = K.layers.Add()([x, h])
    h = K.layers.LayerNormalization(epsilon=1e-6)(x)
    h = K.layers.Dense(dim * expand, use_bias=False, activation="swish")(h)
    h = K.layers.Dense(dim, use_bias=False)(h)
    h = K.layers.Dropout(drop_rate, noise_shape=(None, 1, 1))(h)
    return K.layers.Add()([x, h])


def build_reference_model(cfg) -> K.Model:
    """Reference ``get_model`` for an :class:`EncoderConfig` — stem, block
    stack per variant, top Dense(relu) -> Dropout -> classifier.

    The reference relies on Keras-2 implicit mask propagation from
    ``Masking(0.0)``; Keras 3 does not reliably propagate masks through op
    layers (``x + pe``), so the same mask (frame has any non-zero feature) is
    computed once and passed explicitly — identical semantics, no weights."""
    inp = K.Input((cfg.frame_len, cfg.input_dim))
    mask = K.layers.Lambda(
        lambda t: tf.reduce_any(tf.not_equal(t, 0.0), axis=-1))(inp)
    x = K.layers.Dense(cfg.dim, use_bias=False, name="stem_conv")(inp)
    pe = tf.cast(positional_encoding(cfg.frame_len, cfg.dim), x.dtype)
    x = x + pe
    x = K.layers.BatchNormalization(momentum=0.95, name="stem_bn")(x)

    def conv_stack(x):
        for j in range(cfg.num_conv_per_block):
            k = cfg.kernel_sizes[j % len(cfg.kernel_sizes)]
            x = conv1d_block(x, mask, cfg.dim, k, drop_rate=cfg.dropout)
        return x

    v = cfg.variant
    if v in ("squeezeformer", "hybrid"):
        for _ in range(cfg.num_squeeze_blocks):
            x = SqueezeformerBlock(cfg.dim, cfg.num_heads,
                                   cfg.expansion_factor,
                                   cfg.transformer_kernel_size,
                                   cfg.dropout)(x, mask=mask)
    if v in ("conformer", "hybrid"):
        for _ in range(cfg.num_conform_blocks):
            x = ConformerBlock(cfg.dim, cfg.num_heads, cfg.expansion_factor,
                               cfg.transformer_kernel_size,
                               drop_rate=cfg.dropout)(x, mask=mask)
    if v == "conv_hybrid":
        for _ in range(cfg.num_squeeze_blocks):
            x = conv_stack(x)
            x = SqueezeformerBlock(cfg.dim, cfg.num_heads,
                                   cfg.expansion_factor,
                                   cfg.transformer_kernel_size,
                                   cfg.dropout)(x, mask=mask)
        for _ in range(cfg.num_conform_blocks):
            x = conv_stack(x)
            x = ConformerBlock(cfg.dim, cfg.num_heads, cfg.expansion_factor,
                               cfg.transformer_kernel_size,
                               drop_rate=cfg.dropout)(x, mask=mask)
    if v == "conv_transformer":
        for _ in range(cfg.num_squeeze_blocks):
            x = conv_stack(x)
            x = transformer_block(x, mask, cfg.dim, cfg.num_heads,
                                  cfg.expansion_factor, cfg.dropout,
                                  cfg.dropout)

    x = K.layers.Dense(cfg.dim * cfg.top_mult, activation="relu",
                       name="top_conv")(x)
    x = K.layers.Dropout(cfg.top_dropout)(x)
    x = K.layers.Dense(cfg.num_classes, name="classifier")(x)
    return K.Model(inp, x)


def perturb_batch_norms(model: K.Model, seed: int = 0) -> None:
    """Give every BatchNorm non-trivial moving stats so an import must carry
    them to pass the logit diff."""
    rng = np.random.default_rng(seed)
    for layer in model._flatten_layers():
        if isinstance(layer, K.layers.BatchNormalization):
            g, b, m, v = layer.get_weights()
            layer.set_weights([
                g + rng.standard_normal(g.shape).astype(np.float32) * 0.1,
                b + rng.standard_normal(b.shape).astype(np.float32) * 0.1,
                rng.standard_normal(m.shape).astype(np.float32) * 0.2,
                np.abs(rng.standard_normal(v.shape)).astype(np.float32) + 0.5,
            ])
