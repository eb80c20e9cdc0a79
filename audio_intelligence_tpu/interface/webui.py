"""Demo web UI (ETTA stable_audio_tools/interface/gradio.py parity).

The reference ships a gradio app with Generation / Inpainting /
Autoencoder tabs (gradio.py:621-731). gradio isn't in this image, so the
UI is dual-backend:

- gradio when importable (same tab structure),
- a dependency-free stdlib ``http.server`` fallback exposing the same
  actions (prompt form → wav download) — enough to demo a checkpoint from
  a browser on any machine that can reach the host.

Start with: ``python -m audio_intelligence_tpu.interface.webui --port 7860``.
"""

from __future__ import annotations

import argparse
import html
import io
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional


PAGE = """<!doctype html>
<html><head><title>audio_intelligence_tpu demo</title>
<style>body{{font-family:sans-serif;max-width:40em;margin:2em auto}}
textarea,input{{width:100%;margin:.3em 0}}</style></head>
<body>
<h2>Text → Audio (ETTA)</h2>
<form method="post" action="/generate">
<textarea name="prompt" rows="3" placeholder="a dog barking in the rain">{prompt}</textarea>
<label>steps <input name="steps" value="{steps}"></label>
<label>cfg scale <input name="cfg" value="{cfg}"></label>
<label>seconds <input name="seconds" value="{seconds}"></label>
<button>Generate</button>
</form>
<h2>Autoencoder roundtrip</h2>
<form method="post" action="/autoencode">
<label>server-side wav path <input name="path" value=""></label>
<button>Roundtrip</button>
</form>
<h2>Mono → Stereo (diffusion prior)</h2>
<form method="post" action="/stereoize">
<label>server-side wav path <input name="path" value=""></label>
<button>Stereoize</button>
</form>
{result}
</body></html>
"""


class DemoServer:
    """Stdlib fallback server around a ``generate_fn(prompt, steps, cfg,
    seconds) -> (wav_bytes, mimetype)`` callback."""

    def __init__(self, generate_fn: Callable, port: int = 7860,
                 autoencode_fn: Optional[Callable] = None,
                 stereoize_fn: Optional[Callable] = None,
                 host: str = "127.0.0.1"):
        self.generate_fn = generate_fn
        self.autoencode_fn = autoencode_fn
        self.stereoize_fn = stereoize_fn
        self.port = port
        self.host = host
        self._last_audio: Optional[bytes] = None
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send_html(self, body: str, code=200):
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/audio.wav" and outer._last_audio:
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Content-Length", str(len(outer._last_audio)))
                    self.end_headers()
                    self.wfile.write(outer._last_audio)
                    return
                self._send_html(
                    PAGE.format(prompt="", steps=100, cfg=3.5, seconds=10, result="")
                )

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                form = urllib.parse.parse_qs(self.rfile.read(length).decode())
                prompt = form.get("prompt", [""])[0]
                steps = int(form.get("steps", ["100"])[0])
                cfg = float(form.get("cfg", ["3.5"])[0])
                seconds = float(form.get("seconds", ["10"])[0])
                try:
                    if self.path == "/autoencode" and outer.autoencode_fn:
                        path = form.get("path", [""])[0]
                        wav_bytes, _ = outer.autoencode_fn(path)
                        outer._last_audio = wav_bytes
                        result = (
                            f"<p>roundtripped {html.escape(path)}</p>"
                            '<audio controls src="/audio.wav"></audio>'
                        )
                    elif self.path == "/stereoize" and outer.stereoize_fn:
                        path = form.get("path", [""])[0]
                        wav_bytes, _ = outer.stereoize_fn(path)
                        outer._last_audio = wav_bytes
                        result = (
                            f"<p>stereoized {html.escape(path)}</p>"
                            '<audio controls src="/audio.wav"></audio>'
                        )
                    else:
                        wav_bytes, _ = outer.generate_fn(prompt, steps, cfg, seconds)
                        outer._last_audio = wav_bytes
                        result = (
                            f"<p>generated {len(wav_bytes)} bytes for "
                            f"<b>{html.escape(prompt)}</b></p>"
                            '<audio controls src="/audio.wav"></audio>'
                        )
                except Exception as e:  # surface errors in the page
                    result = f"<pre>error: {html.escape(str(e))}</pre>"
                self._send_html(
                    PAGE.format(
                        prompt=html.escape(prompt), steps=steps, cfg=cfg,
                        seconds=seconds, result=result,
                    )
                )

        # localhost by default: this is an unauthenticated demo UI; exposing
        # it on all interfaces requires an explicit --host 0.0.0.0.
        self._server = ThreadingHTTPServer((host, port), Handler)

    def serve_forever(self):
        print(f"demo UI on http://localhost:{self.port}")
        self._server.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self._server.shutdown()


def wav_bytes(audio, sample_rate: int) -> bytes:
    """float audio [C, T] → PCM16 wav bytes."""
    import numpy as np

    from audio_intelligence_tpu.data.audio_io import write_wav
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        path = f.name
    try:
        write_wav(path, sample_rate, np.asarray(audio))
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


def make_etta_generate_fn(model_scale: str = "small"):
    """Build the generation callback (random weights unless checkpoints)."""

    def generate(prompt: str, steps: int, cfg_scale: float, seconds: float):
        import sys

        from cli.etta_generate import main as etta_main  # reuse CLI wiring
        import tempfile, os

        out_dir = tempfile.mkdtemp()
        etta_main(
            [
                "--text_prompt", prompt, "--steps", str(steps),
                "--cfg_scale", str(cfg_scale), "--seconds_total", str(seconds),
                "--output_dir", out_dir, "--model_scale", model_scale,
            ]
        )
        wav_path = os.path.join(out_dir, "sample_0000.wav")
        with open(wav_path, "rb") as f:
            return f.read(), "audio/wav"

    return generate


def make_etta_inpaint_fn(model_scale: str = "small"):
    """Inpainting callback (reference create_sampling_ui inpainting
    accordion, gradio.py:398-460): init wav + mask %s → regenerate the
    masked region. Reuses the CLI wiring; random weights in smoke mode."""

    def inpaint(path: str, prompt: str, steps: int, maskstart: float,
                maskend: float, softness: float, marination: float):
        import os
        import tempfile

        from cli.etta_generate import main as etta_main

        out_dir = tempfile.mkdtemp()
        etta_main(
            [
                "--text_prompt", prompt or "inpaint", "--steps", str(int(steps)),
                "--output_dir", out_dir, "--model_scale", model_scale,
                "--init_audio", path, "--seconds_total", "2.0",
                "--batch_size", "1",
                "--maskstart", str(maskstart), "--maskend", str(maskend),
                "--softnessL", str(softness), "--softnessR", str(softness),
                "--marination", str(marination),
            ]
        )
        with open(os.path.join(out_dir, "sample_0000.wav"), "rb") as f:
            return f.read(), "audio/wav"

    return inpaint


def make_lm_fn():
    """Audio-LM tab callback (reference create_lm_ui, gradio.py:621-731):
    sample delay-interleaved codes from the ETTA audio LM and decode via a
    random-weight codec in smoke mode."""

    def run(seconds: float, temperature: float, top_k: int):
        import numpy as np
        import jax, jax.numpy as jnp

        from audio_intelligence_tpu.models.etta.lm import (
            AudioLanguageModel,
            generate,
        )
        from audio_intelligence_tpu.models.ualm.interleave import (
            delay_deinterleave,
        )

        n_q, k = 4, 64
        frame_rate, sr = 50, 16000
        lm = AudioLanguageModel(
            num_quantizers=n_q, codebook_size=k, dim=64, depth=2, heads=4
        )
        gen_len = max(int(seconds * frame_rate), n_q + 1)
        seed = jnp.full((1, 1, n_q), k, jnp.int32)
        params = lm.init(jax.random.PRNGKey(0), seed)["params"]
        codes = generate(
            lambda p, c: lm.apply({"params": p}, c),
            params, jax.random.PRNGKey(1), batch=1, gen_len=gen_len,
            num_quantizers=n_q, codebook_size=k,
            temperature=float(temperature), top_k=int(top_k),
        )
        codes = delay_deinterleave(np.asarray(codes))
        codes = np.clip(codes, 0, k - 1)
        # smoke codec: map code indices to a waveform deterministicly
        t = np.repeat(codes.mean(-1)[0] / k * 2 - 1, sr // frame_rate)
        return wav_bytes(t.astype(np.float32)[None], sr), "audio/wav"

    return run


def make_autoencoder_fn():
    """VAE roundtrip callback (reference create_autoencoder_ui:681):
    wav path → encode → decode → wav bytes. Random weights in smoke mode."""

    def roundtrip(path: str):
        import numpy as np
        import jax, jax.numpy as jnp

        from audio_intelligence_tpu.data.audio_io import read_wav
        from audio_intelligence_tpu.models.etta.bottleneck import VAEBottleneck
        from audio_intelligence_tpu.models.etta.vae import (
            AudioAutoencoder,
            OobleckDecoder,
            OobleckEncoder,
        )

        audio, sr = read_wav(path)
        x = audio.T[None, :, :2] if audio.shape[0] >= 2 else np.repeat(
            audio.T[None], 2, -1
        )
        ratio = 16
        t = (x.shape[1] // ratio) * ratio
        x = jnp.asarray(x[:, :t])
        ae = AudioAutoencoder(
            encoder=OobleckEncoder(
                in_channels=2, channels=16, latent_dim=16,
                c_mults=(2, 4), strides=(4, 4),
            ),
            decoder=OobleckDecoder(
                out_channels=2, channels=16, latent_dim=8,
                c_mults=(2, 4), strides=(4, 4),
            ),
            bottleneck=VAEBottleneck(),
            downsampling_ratio=ratio,
        )
        v = ae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
        recon, _ = ae.apply(v, x, jax.random.PRNGKey(1))
        return wav_bytes(np.asarray(recon[0]).T, sr), "audio/wav"

    return roundtrip


def make_stereoize_fn():
    """Mono→stereo prior callback (reference create_diffusion_prior_ui:730),
    smoke mode: tiny random prior over a 4× wavelet pretransform."""

    def run(path: str):
        import numpy as np
        import jax, jax.numpy as jnp

        from audio_intelligence_tpu.data.audio_io import read_wav
        from audio_intelligence_tpu.models.etta.diffusion_prior import stereoize
        from audio_intelligence_tpu.models.etta.pretransforms import (
            WaveletPretransform,
        )

        audio, sr = read_wav(path)
        wt = WaveletPretransform(levels=2)
        model_fn = lambda x, t, source: source - x  # smoke prior
        out = stereoize(
            model_fn, wt.encode, wt.decode,
            jnp.asarray(audio[None]), in_sr=sr, sample_rate=sr,
            min_input_length=wt.downsampling_ratio, steps=4,
        )
        return wav_bytes(np.asarray(out[0]), sr), "audio/wav"

    return run


def create_ui(generate_fn: Callable, port: int = 7860,
              autoencode_fn: Optional[Callable] = None,
              stereoize_fn: Optional[Callable] = None,
              host: str = "127.0.0.1",
              inpaint_fn: Optional[Callable] = None,
              lm_fn: Optional[Callable] = None):
    """gradio when available, stdlib server otherwise (reference create_ui
    tab structure: txt2audio / inpainting / autoencoder / diffusion prior /
    LM, gradio.py:398-460, 621-731)."""
    try:
        import gradio as gr

        def wrapped(prompt, steps, cfg, seconds):
            data, _ = generate_fn(prompt, int(steps), float(cfg), float(seconds))
            return data

        with gr.Blocks(title="audio_intelligence_tpu") as demo:
            with gr.Tab("Generation"):
                prompt = gr.Textbox(label="prompt")
                steps = gr.Slider(10, 250, 100, label="steps")
                cfg = gr.Slider(1, 10, 3.5, label="cfg scale")
                seconds = gr.Slider(1, 30, 10, label="seconds")
                audio = gr.Audio(label="output")
                gr.Button("Generate").click(
                    wrapped, [prompt, steps, cfg, seconds], audio
                )
            if autoencode_fn is not None:
                with gr.Tab("Autoencoder"):
                    path_in = gr.Textbox(label="wav path")
                    audio_out = gr.Audio(label="roundtrip")
                    gr.Button("Roundtrip").click(
                        lambda p: autoencode_fn(p)[0], [path_in], audio_out
                    )
            if stereoize_fn is not None:
                with gr.Tab("Mono→Stereo"):
                    path_in2 = gr.Textbox(label="wav path")
                    audio_out2 = gr.Audio(label="stereo")
                    gr.Button("Stereoize").click(
                        lambda p: stereoize_fn(p)[0], [path_in2], audio_out2
                    )
            if inpaint_fn is not None:
                with gr.Tab("Inpainting"):
                    ip_path = gr.Textbox(label="init wav path")
                    ip_prompt = gr.Textbox(label="prompt")
                    ip_steps = gr.Slider(4, 250, 100, label="steps")
                    ip_start = gr.Slider(0, 100, 25, label="mask start %")
                    ip_end = gr.Slider(0, 100, 75, label="mask end %")
                    ip_soft = gr.Slider(0, 30, 5, label="softness %")
                    ip_marin = gr.Slider(0, 0.9, 0.0, label="marination")
                    ip_out = gr.Audio(label="inpainted")
                    gr.Button("Inpaint").click(
                        lambda *a: inpaint_fn(*a)[0],
                        [ip_path, ip_prompt, ip_steps, ip_start, ip_end,
                         ip_soft, ip_marin],
                        ip_out,
                    )
            if lm_fn is not None:
                with gr.Tab("Audio LM"):
                    lm_secs = gr.Slider(0.5, 10, 2, label="seconds")
                    lm_temp = gr.Slider(0.1, 2.0, 1.0, label="temperature")
                    lm_topk = gr.Slider(1, 250, 50, step=1, label="top-k")
                    lm_out = gr.Audio(label="sampled audio")
                    gr.Button("Sample").click(
                        lambda s, t, k: lm_fn(s, t, k)[0],
                        [lm_secs, lm_temp, lm_topk], lm_out,
                    )
        return demo
    except ImportError:
        return DemoServer(generate_fn, port, autoencode_fn=autoencode_fn,
                          stereoize_fn=stereoize_fn, host=host)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address (0.0.0.0 to expose externally)")
    p.add_argument("--model_scale", default="small")
    args = p.parse_args(argv)
    ui = create_ui(
        make_etta_generate_fn(args.model_scale), args.port,
        autoencode_fn=make_autoencoder_fn(), stereoize_fn=make_stereoize_fn(),
        host=args.host,
        inpaint_fn=make_etta_inpaint_fn(args.model_scale),
        lm_fn=make_lm_fn(),
    )
    if isinstance(ui, DemoServer):
        ui.serve_forever()
    else:
        ui.launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
