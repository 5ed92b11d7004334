"""Real multi-host bring-up: two jax.distributed processes on localhost run
one sharded training step through the production train loop (per-host data
sharding via make_global_batch, orbax sharded checkpointing).

The reference is single-device (SURVEY §2.10); this validates the TPU-native
multi-host path end-to-end without pod hardware: 2 processes x 2 virtual CPU
devices = a 4x1 ('data', 'model') mesh spanning process boundaries.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
port = sys.argv[2]
out_dir = sys.argv[3]
sys.path.insert(0, sys.argv[4])

from toucan_tpu.dist import initialize_distributed, make_mesh
initialize_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2

import numpy as np
import jax.numpy as jnp
from toucan_tpu.models.gst import StyleEmbedding
from toucan_tpu.models.toucan_tts import ToucanTTSConfig
from toucan_tpu.train.loop import train_loop

TINY = ToucanTTSConfig(adim=32, aheads=2, enc_layers=1, enc_units=64,
                       dec_layers=1, dec_units=64, duration_layers=1,
                       pitch_layers=1, energy_layers=1, duration_chans=16,
                       pitch_chans=16, energy_chans=16, glow_blocks=2,
                       glow_hidden=16, utt_embed_dim=64, lang_embs=100)

rnd = np.random.RandomState(0)  # same synthetic corpus on every host
dataset = []
for i in range(8):
    t = 4 + (i % 3)
    durations = rnd.randint(1, 3, size=(t,)).astype(np.int32)
    dataset.append(dict(
        text=(rnd.rand(t, 62) > 0.5).astype(np.float32),
        mel=rnd.randn(int(durations.sum()), 80).astype(np.float32),
        durations=durations,
        pitch=rnd.randn(t, 1).astype(np.float32),
        energy=rnd.randn(t, 1).astype(np.float32),
        lang_id=3,
    ))

gst_vars = StyleEmbedding().init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 20, 80)), jnp.array([20]))
mesh = make_mesh(n_data=4, n_model=1)
state, history = train_loop(
    dataset, gst_vars, out_dir, config=TINY, batch_size=4, lr=1e-4,
    warmup_steps=1, steps=1, postnet_start_steps=0, use_discriminator=False,
    mesh=mesh, steps_per_checkpoint=2, log_every=1)
assert history and np.isfinite(history[-1]["total_loss"])
print("MULTIHOST_OK", pid, history[-1]["total_loss"])

# vocoder-GAN step across the same 2-process mesh (VERDICT r02 #2: the
# reference's largest training workload, hifigan_train_loop.py, data-parallel)
from toucan_tpu.models.vocoders import HiFiGANGenerator
from toucan_tpu.models.vocoders.discriminators import AvocodoJointDiscriminator
from toucan_tpu.train.vocoder_train import (create_vocoder_train_state,
                                            make_sharded_vocoder_steps)
from toucan_tpu.dist import make_global_batch

gen = HiFiGANGenerator(channels=32, resblock_kernel_sizes=(3,),
                       resblock_dilations=((1, 3),))
disc = AvocodoJointDiscriminator(channel_scale=0.05)
v_state, v_opts = create_vocoder_train_state(jax.random.PRNGKey(0),
                                             generator=gen, discriminator=disc,
                                             segment_frames=8)
warm_step, adv_step, v_sh = make_sharded_vocoder_steps(
    v_state, v_opts, mesh, generator=gen, discriminator=disc)
v_state = jax.device_put(v_state, v_sh)
# each host contributes its local half of the global batch of 4
local = np.random.RandomState(100 + pid)
v_batch = make_global_batch(dict(
    gold_wave=local.randn(2, 8 * 384, 1).astype(np.float32) * 0.1,
    mel=local.randn(2, 8, 80).astype(np.float32)), mesh)
v_state, v_metrics = adv_step(v_state, v_batch, True)
g_loss = float(v_metrics["generator_total"])
d_loss = float(v_metrics["discriminator_loss"])
assert np.isfinite(g_loss) and np.isfinite(d_loss)
assert int(v_state.step) == 1
print("MULTIHOST_VOCODER_OK", pid, g_loss)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = str(_free_port())
    out_dir = str(tmp_path / "ckpt")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), port, out_dir, repo],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_OK {pid}" in out, out[-4000:]
        assert f"MULTIHOST_VOCODER_OK {pid}" in out, out[-4000:]
    # both hosts computed the same global losses (acoustic + vocoder GAN)
    for tag in ("MULTIHOST_OK", "MULTIHOST_VOCODER_OK"):
        loss0 = [l for l in outs[0].splitlines() if tag in l][0].split()[-1]
        loss1 = [l for l in outs[1].splitlines() if tag in l][0].split()[-1]
        assert abs(float(loss0) - float(loss1)) < 1e-5
    # the sharded checkpoint landed on disk
    assert os.path.isdir(out_dir) and len(os.listdir(out_dir)) > 0
