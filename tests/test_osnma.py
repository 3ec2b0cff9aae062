"""OSNMA engine tests (reference osnma_msg_receiver.cc + gnss_crypto.cc
analogs): TESLA chain math, DSM-KROOT ECDSA verification, MACK tag
authentication including tamper detection."""

import numpy as np
import pytest

from gnss_sdr_tpu.telemetry.osnma import (
    _HAVE_CRYPTO,
    ChainParams,
    OsnmaReceiver,
    OsnmaSigner,
    tesla_previous_key,
    verify_tesla_key,
)

pytestmark = pytest.mark.skipif(
    not _HAVE_CRYPTO, reason="cryptography library unavailable")


def _run_chain(signer, rx, n_sf=6, tamper_at=None):
    rng = np.random.default_rng(7)
    for sf in signer.dsm_kroot_subframes():
        rx.feed_hkroot(0, sf)
    assert rx.kroot_verified
    navs = []
    for i in range(n_sf):
        nav = rng.integers(0, 2, 549).astype(np.uint8)   # one I/NAV subframe
        navs.append(nav)
        mack = signer.mack_subframe(i, nav, prn=11)
        nav_fed = nav.copy()
        if tamper_at is not None and i == tamper_at:
            nav_fed[100] ^= 1                            # spoofed nav bit
        rx.feed_mack(signer._gst(i), i, mack, nav_fed, prn=11)
    return navs


def test_tesla_chain_roundtrip():
    signer = OsnmaSigner(num_keys=16, seed=3)
    p = signer.params
    assert verify_tesla_key(p, signer.keys[10], 10, signer._gst)
    # a corrupted key must not verify
    bad = bytearray(signer.keys[10])
    bad[0] ^= 0xFF
    assert not verify_tesla_key(p, bytes(bad), 10, signer._gst)


def test_kroot_signature_and_tag_authentication():
    signer = OsnmaSigner(num_keys=16, seed=1)
    rx = OsnmaReceiver(public_key=signer.public_key)
    _run_chain(signer, rx, n_sf=6)
    assert rx.authenticated_subframes >= 5      # last tag awaits next key
    assert rx.failed_subframes == 0


def test_tampered_navigation_detected():
    signer = OsnmaSigner(num_keys=16, seed=2)
    rx = OsnmaReceiver(public_key=signer.public_key)
    _run_chain(signer, rx, n_sf=6, tamper_at=2)
    assert rx.failed_subframes >= 1
    bad = [r for r in rx.reports if not r.ok]
    assert bad and bad[0].prn == 11


def test_wrong_public_key_rejects_kroot():
    signer = OsnmaSigner(num_keys=8, seed=4)
    other = OsnmaSigner(num_keys=8, seed=5)
    rx = OsnmaReceiver(public_key=other.public_key)
    for sf in signer.dsm_kroot_subframes():
        rx.feed_hkroot(0, sf)
    assert not rx.kroot_verified


def test_cmac_aes_mode():
    signer = OsnmaSigner(num_keys=8, seed=6, mac_func=1)
    rx = OsnmaReceiver(public_key=signer.public_key)
    _run_chain(signer, rx, n_sf=4)
    assert rx.authenticated_subframes >= 3
    assert rx.failed_subframes == 0


def test_osnma_through_inav_pages():
    """OSNMA riding real I/NAV pages: signer -> 40-bit page fields ->
    encoded symbol stream -> InavDecoder -> field reassembly ->
    OsnmaReceiver authentication (the full reference path
    galileo_telemetry_decoder_gs -> osnma_msg_receiver)."""
    from gnss_sdr_tpu.telemetry.inav import (
        GalileoEphemeris,
        InavDecoder,
        InavEncoder,
    )

    signer = OsnmaSigner(num_keys=32, seed=9)
    rng = np.random.default_rng(2)
    nav = rng.integers(0, 2, 549).astype(np.uint8)
    hkroots = signer.dsm_kroot_subframes()
    # the DSM-KROOT (incl. the DER signature) spans ~8 subframes; run two
    # extra so at least one MACK verifies after KROOT assembly
    n_sf = len(hkroots) + 3
    sf_fields = []
    for i in range(n_sf):
        hk = hkroots[i % len(hkroots)]
        mack = signer.mack_subframe(i, nav, prn=5)
        sf_fields.append((hk, mack))

    def page_bits(k):
        sf, p = divmod(k, 15)
        hk, mack = sf_fields[sf % n_sf]
        return np.concatenate([hk[p * 8:(p + 1) * 8],
                               mack[p * 32:(p + 1) * 32]])

    eph = GalileoEphemeris(prn=5, week=1200, toe=7200.0, sqrt_a=5440.6,
                           iod_nav=1)
    enc = InavEncoder(eph, tow0_s=7000.0, osnma_page_bits=page_bits)
    syms = 1.0 - 2.0 * enc.symbols(15 * n_sf).astype(np.float64)
    dec = InavDecoder(5)
    dec.push_symbols(syms, np.arange(len(syms)) * 1000)
    assert dec.pages_ok >= 15 * n_sf - 1
    fields = [f for _, f in dec.osnma_fields]

    rx = OsnmaReceiver(public_key=signer.public_key)
    for sf in range(len(fields) // 15):
        chunk = fields[sf * 15:(sf + 1) * 15]
        hk = np.concatenate([c[:8] for c in chunk])
        mack = np.concatenate([c[8:] for c in chunk])
        rx.feed_hkroot(sf, hk)
        if rx.kroot_verified:
            rx.feed_mack(signer._gst(sf), sf, mack, nav, prn=5)
    assert rx.kroot_verified
    assert rx.authenticated_subframes >= 1
    assert rx.failed_subframes == 0
