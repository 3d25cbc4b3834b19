"""int8 weight-streaming observe window (ops/qcore.py) numerics.

The kernel's target is NOT the bf16 model (int8 quantization changes the
weights) but the DEQUANTIZED weights: the parity contract is that
qobs_window equals the XLA observe reference evaluated at
dequantize_params(quantize_params(w)). A separate test bounds the
quantization error itself against the original weights.
"""

import numpy as np

from embodied_tpu.ops import observe_seq as seqlib
from embodied_tpu.ops import qcore

from test_ops_seq import make_gumbels, make_inputs, make_params, C, G, S


class TestQuantize:

  def test_roundtrip_error_bounded(self):
    params = make_params()
    qparams, scales = qcore.quantize_params(params)
    deq = qcore.dequantize_params(qparams, scales, dtype=np.float32)
    for name, orig, back in zip(qcore.FIELDS, params, deq):
      orig = np.asarray(orig, np.float32)
      back = np.asarray(back, np.float32)
      if name not in qcore.QUANT:
        np.testing.assert_array_equal(orig, back)
        continue
      colmax = np.abs(orig).max(axis=-2, keepdims=True)
      # Symmetric int8: error within half a quantization step per column.
      err = np.abs(orig - back)
      bound = colmax / 127.0 * 0.51 + 1e-7
      assert (err <= bound).all(), (name, err.max(), bound.max())

  def test_int8_storage(self):
    qparams, scales = qcore.quantize_params(make_params())
    p = dict(zip(qcore.FIELDS, qparams))
    for name in qcore.QUANT:
      assert p[name].dtype == np.int8, name
      assert scales[name].dtype == np.float32, name


class TestWindowParity:

  def test_matches_reference_on_dequantized_weights(self):
    params = make_params()
    qparams, scales = qcore.quantize_params(params)
    deq = qcore.dequantize_params(qparams, scales, dtype=np.float32)
    deter0, stoch0, act, tok, keep = make_inputs()
    gum = make_gumbels(7)
    dseq, sseq, lseq = qcore.qobs_window(
        deter0, stoch0, act, tok, keep, gum, qparams, scales,
        g=G, S=S, C=C, nch=4, interpret=True)
    s3 = np.asarray(sseq).reshape(*sseq.shape[:2], S, C)
    np.testing.assert_array_equal(
        s3.sum(-1), np.ones(s3.shape[:-1]))
    rd, rs, rl = seqlib.reference_observe_seq(
        deter0, stoch0, act, tok, keep, deq, sseq, C)
    np.testing.assert_allclose(
        np.asarray(dseq), np.asarray(rd), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lseq), np.asarray(rl), rtol=2e-3, atol=2e-3)

  def test_chunking_is_invisible(self):
    params = make_params()
    qparams, scales = qcore.quantize_params(params)
    deter0, stoch0, act, tok, keep = make_inputs()
    gum = make_gumbels(9)
    outs = [qcore.qobs_window(
        deter0, stoch0, act, tok, keep, gum, qparams, scales,
        g=G, S=S, C=C, nch=nch, interpret=True) for nch in (1, 4)]
    for a, b in zip(*outs):
      np.testing.assert_allclose(
          np.asarray(a, np.float32), np.asarray(b, np.float32),
          rtol=1e-4, atol=1e-4)
