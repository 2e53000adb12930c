"""Output writers: timestamps + file contents."""

import json

import pytest

from cli.output_formats import (
    WRITERS,
    format_timestamp,
    write_outputs,
)

SEGS = [
    {"t0": 0, "t1": 500, "text": " Hello world.", "tokens": [1, 2],
     "probs": [0.9, 0.8], "speaker_turn_next": False},
    {"t0": 500, "t1": 6000, "text": ' With "quotes".', "tokens": [3],
     "probs": [0.7], "speaker_turn_next": False},
]


def test_format_timestamp():
    # reference to_timestamp examples (src/qwen2-whisper.cpp:2386-2388)
    assert format_timestamp(500) == "00:00:05.000"
    assert format_timestamp(6000) == "00:01:00.000"
    assert format_timestamp(500, comma=True) == "00:00:05,000"


def test_txt(tmp_path):
    p = str(tmp_path / "o.txt")
    WRITERS["txt"](p, SEGS)
    lines = open(p).read().splitlines()
    assert lines == ["Hello world.", 'With "quotes".']


def test_vtt(tmp_path):
    p = str(tmp_path / "o.vtt")
    WRITERS["vtt"](p, SEGS)
    text = open(p).read()
    assert text.startswith("WEBVTT")
    assert "00:00:00.000 --> 00:00:05.000" in text


def test_srt(tmp_path):
    p = str(tmp_path / "o.srt")
    WRITERS["srt"](p, SEGS)
    text = open(p).read()
    assert text.startswith("1\n00:00:00,000 --> 00:00:05,000")
    assert "\n2\n" in text


def test_lrc(tmp_path):
    p = str(tmp_path / "o.lrc")
    WRITERS["lrc"](p, SEGS)
    assert "[00:05.00]" in open(p).read()


def test_csv(tmp_path):
    p = str(tmp_path / "o.csv")
    WRITERS["csv"](p, SEGS)
    lines = open(p).read().splitlines()
    assert lines[0] == "start,end,text"
    assert lines[1] == '0,5000,"Hello world."'
    assert '""quotes""' in lines[2]


def test_json(tmp_path):
    p = str(tmp_path / "o.json")
    WRITERS["json"](p, SEGS)
    doc = json.load(open(p))
    assert len(doc["transcription"]) == 2
    assert doc["transcription"][0]["offsets"] == {"from": 0, "to": 5000}


def test_write_outputs_dispatch(tmp_path):
    class A:
        output_txt = True
        output_vtt = False
        output_srt = True
        output_lrc = False
        output_csv = False
        output_json = True
        output_file = None
    base = str(tmp_path / "clip.wav")
    written = write_outputs(base, SEGS, A())
    assert sorted(w.rsplit(".", 1)[1] for w in written) == ["json", "srt", "txt"]
    assert all(w.startswith(str(tmp_path / "clip.")) for w in written)


def test_srt_offset_n(tmp_path):
    """-on segment index offset lands in SRT numbering."""
    from cli.output_formats import write_srt
    p = str(tmp_path / "o.srt")
    write_srt(p, SEGS, start=5)
    lines = open(p).read().splitlines()
    assert lines[0] == "5"
    assert "6" in lines


def test_json_full_via_ojf(tmp_path):
    """-ojf implies the json writer with per-token detail (≙ reference
    main.cpp:151 output_jsn_full -> output_jsn, :520 token_timestamps)."""
    class A:
        output_txt = False
        output_vtt = False
        output_srt = False
        output_lrc = False
        output_csv = False
        output_json = False          # -ojf alone must still write json
        output_json_full = True
        output_file = None
    base = str(tmp_path / "clip.wav")
    segs = [dict(SEGS[0], token_texts=["He", "llo"],
                 token_times=[0, 250]),
            {"t0": 500, "t1": 600, "text": " x", "tokens": [7],
             "speaker_turn_next": False}]      # no probs/texts recorded
    written = write_outputs(base, segs, A())
    assert [w.rsplit(".", 1)[1] for w in written] == ["json"]
    doc = json.load(open(written[0]))
    toks = doc["transcription"][0]["tokens"]
    assert [t["id"] for t in toks] == [1, 2]
    assert toks[0]["p"] == pytest.approx(0.9)
    assert [t["text"] for t in toks] == ["He", "llo"]
    assert toks[1]["offsets"] == {"from": 2500}
    # a segment without probs/texts still emits every token id
    toks2 = doc["transcription"][1]["tokens"]
    assert [t["id"] for t in toks2] == [7]
    assert "p" not in toks2[0]


def test_cli_tpi_and_ojf_mapping():
    """-tpi feeds temperature_inc (zeroed by -nf, main.cpp:534); -ojf
    turns on token timestamps (main.cpp:520)."""
    from cli.main import build_parser, build_full_params
    args = build_parser().parse_args(["-f", "x.wav", "-tpi", "0.35", "-ojf"])
    fp = build_full_params(args)
    assert fp.temperature_inc == pytest.approx(0.35)
    assert fp.token_timestamps
    args = build_parser().parse_args(["-f", "x.wav", "-tpi", "0.35", "-nf"])
    fp = build_full_params(args)
    assert fp.temperature_inc == 0.0
