"""App/CLI layer: flag parsing, end-to-end actions through main(), help."""

import json
import os

import numpy as np
import pytest

from frad_python_tpu.app.main import main
from frad_python_tpu.utils import cli
from frad_python_tpu.utils.fmt import format_si, format_speed, format_time, get_file_stem
from frad_python_tpu.utils.telemetry import StreamStats, status_line


class TestCliParse:
    def test_defaults(self):
        action, meta, inp, p = cli.parse(["x", "encode", "in.pcm"])
        assert (action, inp) == ("encode", "in.pcm")
        assert p.pcm == "f64be" and p.profile == 4 and p.frame_size == 2048
        assert p.overlap_ratio == 16 and p.ecc_ratio == (96, 24)

    def test_flags(self):
        _, _, _, p = cli.parse(["x", "enc", "a", "--srate", "48000", "-ch", "2",
                                "--bits", "16", "-p", "1", "--ecc", "64", "32",
                                "--le", "-y", "--log", "2", "--turbo"])
        assert p.srate == 48000 and p.channels == 2 and p.bits == 16
        assert p.profile == 1 and p.enable_ecc and p.ecc_ratio == (64, 32)
        assert p.little_endian and p.overwrite and p.loglevel == 2 and p.turbo

    def test_ecc_without_ratio(self):
        _, _, _, p = cli.parse(["x", "enc", "a", "--ecc", "--bits", "16"])
        assert p.enable_ecc and p.ecc_ratio == (96, 24) and p.bits == 16

    def test_meta_action(self):
        action, meta, inp, p = cli.parse(
            ["x", "meta", "add", "f.frad", "--meta", "K", "V"])
        assert (action, meta, inp) == ("meta", "add", "f.frad")
        assert p.meta == [("K", b"V")]

    def test_keys_to_speed(self):
        _, _, _, p = cli.parse(["x", "play", "f", "--keys", "12"])
        assert p.speed == pytest.approx(2.0)


class TestFormatters:
    def test_time(self):
        assert format_time(0) == "0"
        assert format_time(1.5) == "1.500 s"
        assert format_time(65) == "1:05.000"
        assert format_time(3600 + 61) == "1:01:01.000"
        assert format_time(31557600 * 2 + 1) .startswith("J2.")

    def test_si(self):
        assert format_si(0) == "0 "
        assert format_si(1234) == "1.234 k"
        assert format_si(5e9) == "5.000 G"

    def test_speed(self):
        assert format_speed(123.4) == "123"
        assert format_speed(12.34) == "12.3"
        assert format_speed(0.5) == "0.500"

    def test_stem(self):
        assert get_file_stem("/a/b/c.frad") == "c"
        assert get_file_stem(".hidden") == ".hidden"
        assert get_file_stem("-") == "pipe"
        assert get_file_stem("a.b.c") == "a.b"
        assert get_file_stem("plain") == "plain"


class TestStreamStats:
    def test_rates_and_speed(self):
        now = [100.0]
        s = StreamStats(clock=lambda: now[0])
        s.log(4410 * 2, samples=4410, srate=44100)   # 0.1 s of audio
        s.log(9600 * 2, samples=9600, srate=48000)   # 0.2 s of audio
        now[0] += 0.1
        assert s.total_bytes == (4410 + 9600) * 2
        assert s.coded_seconds == pytest.approx(0.3)
        assert s.speed == pytest.approx(3.0)
        assert s.bitrate == pytest.approx((4410 + 9600) * 16 / 0.3)

    def test_pause_excludes_prompt_time(self):
        now = [0.0]
        s = StreamStats(clock=lambda: now[0])
        s.log(100, samples=44100, srate=44100)
        now[0] = 1.0
        s.pause()
        now[0] = 11.0    # 10 s stuck at an interactive prompt
        s.resume()
        now[0] = 12.0
        assert s.elapsed == pytest.approx(2.0)
        assert s.speed == pytest.approx(0.5)

    def test_status_line_shapes(self):
        s = StreamStats(clock=lambda: 0.0)
        assert status_line(s).startswith("size=0 B")
        assert "B/s" in status_line(s, bytes_only=True)
        s.log(2000, samples=44100, srate=44100)
        line = status_line(s)
        assert "time=1.000 s" in line and "bitrate=16.000 kbit/s" in line


@pytest.fixture
def tone_pcm(tmp_path):
    srate = 44100
    t = np.arange(srate // 4) / srate
    sig = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                    0.5 * np.sin(2 * np.pi * 660 * t)], 1)
    path = tmp_path / "tone.pcm"
    path.write_bytes((sig * 32768).astype(">i2").tobytes())
    return path, sig


class TestEndToEnd:
    def test_encode_decode_cycle(self, tone_pcm, tmp_path):
        pcm_path, sig = tone_pcm
        frad = tmp_path / "out.frad"
        main(["frad-tpu", "encode", str(pcm_path), "--srate", "44100",
              "--ch", "2", "--pcm", "s16be", "--bits", "24", "--profile", "0",
              "--ecc", "-o", str(frad), "-y",
              "--tag", "TITLE", "tone"])
        assert frad.exists() and frad.stat().st_size > 0

        out = tmp_path / "back"
        main(["frad-tpu", "decode", str(frad), "--pcm", "s16be", "--ecc",
              "-o", str(out), "-y"])
        got = np.frombuffer((tmp_path / "back.pcm").read_bytes(), ">i2")
        want = (sig * 32768).astype(">i2").ravel()
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_turbo_matches_streaming(self, tone_pcm, tmp_path):
        pcm_path, _ = tone_pcm
        a = tmp_path / "a.frad"
        b = tmp_path / "b.frad"
        for out, extra in ((a, []), (b, ["--turbo"])):
            main(["frad-tpu", "encode", str(pcm_path), "--srate", "44100",
                  "--ch", "2", "--pcm", "s16be", "--profile", "1",
                  "-o", str(out), "-y"] + extra)
        assert a.read_bytes() == b.read_bytes()

    def test_exact_decode_matches_per_frame_engine(self, tone_pcm, tmp_path):
        """--exact must take the strictly per-frame Decoder path:
        output bit-identical to a hand-driven Decoder(exact=True) fed
        in uneven chunks (the reference's exact chunk invariance)."""
        from frad_python_tpu import Decoder
        pcm_path, _ = tone_pcm
        frad = tmp_path / "x.frad"
        main(["frad-tpu", "encode", str(pcm_path), "--srate", "44100",
              "--ch", "2", "--pcm", "s16be", "--profile", "1",
              "-o", str(frad), "-y"])
        out = tmp_path / "xb"
        main(["frad-tpu", "decode", str(frad), "--pcm", "s16be",
              "--exact", "-o", str(out), "-y"])
        got = np.frombuffer((tmp_path / "xb.pcm").read_bytes(), ">i2")

        d = Decoder(exact=True)
        stream = frad.read_bytes()
        parts = [d.process(stream[i:i + 997]).pcm
                 for i in range(0, len(stream), 997)]
        parts.append(d.flush().pcm)
        ref = np.concatenate([p for p in parts if p.size])
        want = np.clip(ref * 32768.0, -(2 ** 15), 2 ** 15 - 1).astype(">i2")
        np.testing.assert_array_equal(got, want.ravel())

    def test_meta_roundtrip(self, tone_pcm, tmp_path, monkeypatch):
        pcm_path, _ = tone_pcm
        frad = tmp_path / "m.frad"
        main(["frad-tpu", "encode", str(pcm_path), "--srate", "44100",
              "--ch", "2", "--pcm", "s16be", "-o", str(frad), "-y",
              "--tag", "TITLE", "first"])
        main(["frad-tpu", "meta", "add", str(frad), "--meta", "ARTIST", "me"])
        monkeypatch.chdir(tmp_path)
        main(["frad-tpu", "meta", "parse", str(frad)])
        meta = json.loads((tmp_path / "m.json").read_text())
        assert [m["key"] for m in meta] == ["TITLE", "ARTIST"]

        main(["frad-tpu", "meta", "remove", str(frad), "--meta", "TITLE"])
        main(["frad-tpu", "meta", "parse", str(frad)])
        meta = json.loads((tmp_path / "m.json").read_text())
        assert [m["key"] for m in meta] == ["ARTIST"]

    def test_repair_roundtrip(self, tone_pcm, tmp_path):
        pcm_path, sig = tone_pcm
        frad = tmp_path / "r.frad"
        main(["frad-tpu", "encode", str(pcm_path), "--srate", "44100",
              "--ch", "2", "--pcm", "s16be", "--profile", "4", "--bits", "64",
              "-o", str(frad), "-y"])
        armored = tmp_path / "r2.frad"
        main(["frad-tpu", "repair", str(frad), "--ecc", "96", "24",
              "-o", str(armored), "-y"])
        assert armored.stat().st_size > frad.stat().st_size

        # corrupt then repair in place via --overwrite
        data = bytearray(armored.read_bytes())
        data[200] ^= 0x55
        armored.write_bytes(bytes(data))
        main(["frad-tpu", "repair", str(armored), "--ecc", "96", "24",
              "-o", str(tmp_path / "r3.frad"), "-y"])
        out = tmp_path / "dec"
        main(["frad-tpu", "decode", str(tmp_path / "r3.frad"), "--pcm", "s16be",
              "-o", str(out), "-y"])
        got = np.frombuffer((tmp_path / "dec.pcm").read_bytes(), ">i2")
        want = (sig * 32768).astype(">i2").ravel()
        np.testing.assert_array_equal(got, want)

    def test_help(self, capsys):
        main(["frad-tpu", "help"])
        out = capsys.readouterr().out
        assert "encode" in out and "decode" in out
        main(["frad-tpu", "help", "profiles"])
        out = capsys.readouterr().out
        assert "Profile 1" in out and "28672" in out

    def test_missing_input_errors(self, tmp_path):
        with pytest.raises(SystemExit):
            main(["frad-tpu", "encode", str(tmp_path / "nope.pcm"),
                  "--srate", "44100", "--ch", "2"])
