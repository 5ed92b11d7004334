"""Gradio GUI (reference: ``run_controllable_GUI.py``).

Text box, language/accent dropdowns, voice seed, six embedding sliders and
four prosody sliders -> audio.  Gradio is optional; without it the module
still exposes ``build_interface`` for programmatic use.
"""

import os

from toucan_tpu.compat.load import interface_from_torch, load_embedding_gan
from toucan_tpu.infer.controllable import LANGUAGE_NAME_TO_CODE, ControllableInterface
from toucan_tpu.models.embedding_gan import GanWrapper

MODELS_DIR = os.environ.get("TOUCAN_MODELS_DIR", "Models")


def build_interface():
    tts = interface_from_torch(
        tts_path=os.path.join(MODELS_DIR, "ToucanTTS_Meta", "best.pt"),
        vocoder_path=os.path.join(MODELS_DIR, "Avocodo", "best.pt"),
        embedding_path=os.path.join(MODELS_DIR, "Embedding", "embedding_function.pt"))
    # the artificial-voice feature REQUIRES the trained WGAN generator
    # (reference GAN.py:20-23); a random-init generator would silently
    # produce garbage voices, so a missing checkpoint is a hard error.
    gan_ckpt_path = os.path.join(MODELS_DIR, "Embedding", "embedding_gan.pt")
    if not os.path.exists(gan_ckpt_path):
        raise FileNotFoundError(
            f"embedding GAN checkpoint not found at {gan_ckpt_path}; "
            "fetch it with run_model_downloader.py — the GUI's artificial "
            "voices depend on the trained generator")
    g_vars, gen, _, _ = load_embedding_gan(gan_ckpt_path)
    wrapper = GanWrapper(g_vars, gen)
    return ControllableInterface(tts, wrapper)


def main():
    controllable = build_interface()
    try:
        import gradio as gr
    except ImportError:
        print("gradio not installed; use build_interface() programmatically")
        return

    def run(*args):
        sr, wav, plot_path = controllable.read(*args, return_plot=True)
        return (sr, wav), plot_path

    iface = gr.Interface(
        fn=run,
        inputs=[gr.Textbox(lines=2, label="Text"),
                gr.Dropdown(sorted(LANGUAGE_NAME_TO_CODE), value="English",
                            label="Language"),
                gr.Dropdown(sorted(LANGUAGE_NAME_TO_CODE), value="English",
                            label="Accent"),
                gr.Slider(0, 1099, step=1, value=0, label="Voice seed"),
                gr.Slider(0.5, 1.5, value=1.0, label="Duration scale"),
                gr.Slider(0.5, 1.5, value=1.0, label="Pause duration scale"),
                gr.Slider(0.0, 2.0, value=1.0, label="Pitch variance scale"),
                gr.Slider(0.0, 2.0, value=1.0, label="Energy variance scale")] +
               [gr.Slider(-10.0, 10.0, value=0.0, label=f"Embedding slider {i+1}")
                for i in range(6)],
        outputs=[gr.Audio(type="numpy", label="Speech"),
                 gr.Image(type="filepath", label="Alignment and pitch")],
        title="TPU-native IMS Toucan",
        allow_flagging="never")
    iface.launch()


if __name__ == "__main__":
    main()
