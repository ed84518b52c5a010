"""PII redaction kernel (ops/prepare.scrub_text): pattern coverage,
ordering, and no-op behavior on clean text. Pure-kernel tests — no Ray
needed (the Dataset plumbing is covered by the scrub_pii gate entry)."""

import numpy as np
import pyarrow as pa

from search_engine_ray.ops.prepare import scrub_text


def _one(s: str) -> tuple[str, int]:
    clean, n = scrub_text(pa.array([s], pa.string()))
    return clean[0].as_py(), int(n[0])


def test_email_redacted():
    clean, n = _one("write to jane.doe+spam@sub.example.co.uk today")
    assert clean == "write to <EMAIL> today"
    assert n == 1


def test_phone_and_ssn_do_not_collide():
    # SSN pattern must win over the phone pattern (applied first)
    clean, n = _one("ssn 123-45-6789 phone 415-555-0199")
    assert "<SSN>" in clean and "<PHONE>" in clean
    assert n == 2


def test_card_number_with_spaces_and_dashes():
    for sep in (" ", "-"):
        clean, n = _one(f"card 4111{sep}1111{sep}1111{sep}1111 end")
        assert clean == "card <CARD> end", clean
        assert n == 1


def test_ipv4_redacted():
    clean, n = _one("host at 192.168.10.7 responded")
    assert clean == "host at <IP> responded"
    assert n == 1


def test_clean_text_untouched():
    s = "the quick brown fox jumped over 42 lazy dogs in 2026"
    clean, n = _one(s)
    assert clean == s
    assert n == 0


def test_vectorized_batch_counts():
    arr = pa.array(
        ["a@b.co and c@d.org", "no pii here", "ip 10.0.0.1"], pa.string()
    )
    clean, n = scrub_text(arr)
    assert n.tolist() == [2, 0, 1]
    assert clean[0].as_py() == "<EMAIL> and <EMAIL>"
    assert isinstance(n, np.ndarray)
