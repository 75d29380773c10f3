"""Shape-bucketed jitted eval runner: parity with eager + compile count."""

import jax.numpy as jnp
import numpy as np

from helpers import tiny_model_config


def _model_and_params():
    import jax
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel

    cfg = tiny_model_config(head_type="vl")
    model = OnePeaceRetrievalModel(cfg)
    return model, model.init(jax.random.PRNGKey(0))


def test_ragged_batches_share_one_program_and_match_eager():
    from one_peace_tpu.tasks.jit_eval import JitEvaluator

    model, params = _model_and_params()
    ev = JitEvaluator(model)
    rs = np.random.RandomState(0)
    full = rs.randn(8, 3, 32, 32).astype(np.float32)
    ragged = rs.randn(5, 3, 32, 32).astype(np.float32)

    out_full = ev(params, {"src_images": full}, encoder_type="image")
    out_ragged = ev(params, {"src_images": ragged}, encoder_type="image")
    assert ev.n_compiles == 1  # 5 bucketed up to 8
    assert out_ragged.shape[0] == 5

    ref = model(params, src_images=jnp.asarray(ragged), encoder_type="image")
    np.testing.assert_allclose(np.asarray(out_ragged), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    ref_full = model(params, src_images=jnp.asarray(full), encoder_type="image")
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(ref_full),
                               rtol=2e-5, atol=2e-5)


def test_token_length_bucketing_is_padding_invariant():
    from one_peace_tpu.tasks.jit_eval import JitEvaluator

    model, params = _model_and_params()
    ev = JitEvaluator(model)
    rs = np.random.RandomState(1)
    t10 = rs.randint(5, 99, (8, 10))
    t13 = rs.randint(5, 99, (8, 13))
    out10 = ev(params, {"src_tokens": t10}, encoder_type="text")
    out13 = ev(params, {"src_tokens": t13}, encoder_type="text")
    assert ev.n_compiles == 1  # both bucket to L=16
    ref10 = model(params, src_tokens=jnp.asarray(t10), encoder_type="text")
    np.testing.assert_allclose(np.asarray(out10), np.asarray(ref10),
                               rtol=2e-5, atol=2e-5)
    ref13 = model(params, src_tokens=jnp.asarray(t13), encoder_type="text")
    np.testing.assert_allclose(np.asarray(out13), np.asarray(ref13),
                               rtol=2e-5, atol=2e-5)


def test_audio_length_bucketing_shares_programs():
    """Ragged clip durations bucket to whole seconds: two sub-second-apart
    lengths compile ONE program, and the bucketed output matches the
    eager forward on the original length."""
    import jax
    from one_peace_tpu.models.adapters.audio import conv_output_length
    from one_peace_tpu.models.one_peace import OnePeaceRetrievalModel
    from one_peace_tpu.tasks.jit_eval import JitEvaluator

    cfg = tiny_model_config(head_type="al")
    model = OnePeaceRetrievalModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    ev = JitEvaluator(model, audio_bucket=1024)
    spec = cfg.encoder.audio_adapter.feature_encoder_spec
    rs = np.random.RandomState(0)

    outs = {}
    for t in (900, 1000):  # both bucket to 1024
        wav = rs.randn(4, t).astype(np.float32)
        mask = np.zeros((4, conv_output_length(t, spec) + 1), bool)
        outs[t] = ev(params, {"src_audios": wav,
                              "audio_padding_masks": mask},
                     encoder_type="audio")
    assert ev.n_compiles == 1

    wav = rs.randn(4, 900).astype(np.float32)
    mask = np.zeros((4, conv_output_length(900, spec) + 1), bool)
    got = ev(params, {"src_audios": wav, "audio_padding_masks": mask},
             encoder_type="audio")
    ref = model(params, src_audios=jnp.asarray(wav),
                audio_padding_masks=jnp.asarray(mask), encoder_type="audio")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
