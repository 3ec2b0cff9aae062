/* SUPL/RRLP UPER oracle: compiles the reference's own asn1c-generated
 * codecs from the read-only mount (/root/reference/src/core/libs/supl)
 * into a shared library at test time, exposing uper decode/re-encode
 * round-trips, XER dumps, and a golden RRLP assistance-data builder.
 * Test-only: validates gnss_sdr_tpu/receiver/supl.py byte-for-byte.
 * Note: this asn1c snapshot's uper ENCODER is broken for extensible
 * all-mandatory SEQUENCEs (PosTechnology/PosProtocol fail even when
 * built directly, see test_supl.py), so encode cross-checks are limited
 * to the unaffected message types; the DECODER is authoritative for all.
 */
#include <stdio.h>
#include <string.h>
#include <stdlib.h>
#include <ULP-PDU.h>
#include <PDU.h>
#include <per_decoder.h>
#include <per_encoder.h>

/* uper-decode then uper-re-encode: returns new length or -1 */
int ulp_roundtrip(const unsigned char *in, int inlen,
                  unsigned char *out, int outmax) {
    ULP_PDU_t *pdu = 0;
    asn_dec_rval_t rv = uper_decode_complete(0, &asn_DEF_ULP_PDU,
                                             (void **)&pdu, in, inlen);
    if (rv.code != RC_OK) return -1;
    asn_enc_rval_t er = uper_encode_to_buffer(&asn_DEF_ULP_PDU, pdu,
                                              out, outmax);
    ASN_STRUCT_FREE(asn_DEF_ULP_PDU, pdu);
    if (er.encoded < 0) return -2;
    return (er.encoded + 7) / 8;
}

int ulp_to_xer(const unsigned char *in, int inlen,
               char *out, int outmax) {
    ULP_PDU_t *pdu = 0;
    asn_dec_rval_t rv = uper_decode_complete(0, &asn_DEF_ULP_PDU,
                                             (void **)&pdu, in, inlen);
    if (rv.code != RC_OK) return -1;
    FILE *f = fmemopen(out, outmax, "w");
    xer_fprint(f, &asn_DEF_ULP_PDU, pdu);
    long n = ftell(f);
    fclose(f);
    ASN_STRUCT_FREE(asn_DEF_ULP_PDU, pdu);
    return (int)n;
}

int rrlp_roundtrip(const unsigned char *in, int inlen,
                   unsigned char *out, int outmax) {
    PDU_t *pdu = 0;
    asn_dec_rval_t rv = uper_decode_complete(0, &asn_DEF_PDU,
                                             (void **)&pdu, in, inlen);
    if (rv.code != RC_OK) return -1;
    asn_enc_rval_t er = uper_encode_to_buffer(&asn_DEF_PDU, pdu,
                                              out, outmax);
    ASN_STRUCT_FREE(asn_DEF_PDU, pdu);
    if (er.encoded < 0) return -2;
    return (er.encoded + 7) / 8;
}

int rrlp_to_xer(const unsigned char *in, int inlen,
                char *out, int outmax) {
    PDU_t *pdu = 0;
    asn_dec_rval_t rv = uper_decode_complete(0, &asn_DEF_PDU,
                                             (void **)&pdu, in, inlen);
    if (rv.code != RC_OK) return -1;
    FILE *f = fmemopen(out, outmax, "w");
    xer_fprint(f, &asn_DEF_PDU, pdu);
    long n = ftell(f);
    fclose(f);
    ASN_STRUCT_FREE(asn_DEF_PDU, pdu);
    return (int)n;
}

const char *last_failed_type = "";
int ulp_roundtrip_dbg(const unsigned char *in, int inlen,
                      unsigned char *out, int outmax) {
    ULP_PDU_t *pdu = 0;
    asn_dec_rval_t rv = uper_decode_complete(0, &asn_DEF_ULP_PDU,
                                             (void **)&pdu, in, inlen);
    if (rv.code != RC_OK) return -1;
    asn_enc_rval_t er = uper_encode_to_buffer(&asn_DEF_ULP_PDU, pdu,
                                              out, outmax);
    if (er.encoded < 0) {
        last_failed_type = er.failed_type ? er.failed_type->name : "?";
        ASN_STRUCT_FREE(asn_DEF_ULP_PDU, pdu);
        return -2;
    }
    ASN_STRUCT_FREE(asn_DEF_ULP_PDU, pdu);
    return (er.encoded + 7) / 8;
}
const char *get_failed_type(void) { return last_failed_type; }

#include <SETCapabilities.h>
#include <LocationId.h>
#include <SUPLSTART.h>

#define RT(NAME, TYPE) \
int NAME(const unsigned char *in, int inlen, unsigned char *out, int outmax) { \
    TYPE##_t *p = 0; \
    asn_dec_rval_t rv = uper_decode_complete(0, &asn_DEF_##TYPE, (void **)&p, in, inlen); \
    if (rv.code != RC_OK) return -1; \
    asn_enc_rval_t er = uper_encode_to_buffer(&asn_DEF_##TYPE, p, out, outmax); \
    ASN_STRUCT_FREE(asn_DEF_##TYPE, p); \
    if (er.encoded < 0) return -2; \
    return (er.encoded + 7) / 8; }

RT(setcap_roundtrip, SETCapabilities)
RT(locid_roundtrip, LocationId)
RT(suplstart_roundtrip, SUPLSTART)

#include <PosTechnology.h>
#include <PosProtocol.h>
#include <PrefMethod.h>
RT(postech_roundtrip, PosTechnology)
RT(posproto_roundtrip, PosProtocol)
RT(prefmethod_roundtrip, PrefMethod)

int posproto_encode_direct(unsigned char *out, int outmax) {
    PosProtocol_t pp;
    memset(&pp, 0, sizeof(pp));
    pp.tia801 = 0; pp.rrlp = 1; pp.rrc = 0;
    asn_enc_rval_t er = uper_encode_to_buffer(&asn_DEF_PosProtocol, &pp,
                                              out, outmax);
    if (er.encoded < 0) return -2;
    return (er.encoded + 7) / 8;
}

#include <NavigationModel.h>
#include <NavModelElement.h>
#include <IonosphericModel.h>
#include <ControlHeader.h>
#include <GPS-AssistData.h>
#include <AssistanceData.h>
#include <ReferenceTime.h>

/* golden RRLP assistanceData: refTime + iono + 1-sat nav model */
int rrlp_assist_golden(unsigned char *out, int outmax) {
    PDU_t pdu; memset(&pdu, 0, sizeof(pdu));
    pdu.referenceNumber = 2;
    pdu.component.present = RRLP_Component_PR_assistanceData;
    AssistanceData_t *ad = &pdu.component.choice.assistanceData;
    static GPS_AssistData_t gad; memset(&gad, 0, sizeof(gad));
    ad->gps_AssistData = &gad;
    ControlHeader_t *ch = &gad.controlHeader;
    static ReferenceTime_t rt; memset(&rt, 0, sizeof(rt));
    rt.gpsTime.gpsTOW23b = 1234567; rt.gpsTime.gpsWeek = 345;
    ch->referenceTime = &rt;
    static IonosphericModel_t im;
    im.alfa0 = 10; im.alfa1 = -11; im.alfa2 = 12; im.alfa3 = -13;
    im.beta0 = 20; im.beta1 = -21; im.beta2 = 22; im.beta3 = -23;
    ch->ionosphericModel = &im;
    static NavigationModel_t nm; memset(&nm, 0, sizeof(nm));
    static NavModelElement_t el; memset(&el, 0, sizeof(el));
    el.satelliteID = 6;   /* PRN 7 */
    el.satStatus.present = SatStatus_PR_newSatelliteAndModelUC;
    UncompressedEphemeris_t *e = &el.satStatus.choice.newSatelliteAndModelUC;
    e->ephemCodeOnL2 = 1; e->ephemURA = 2; e->ephemSVhealth = 0;
    e->ephemIODC = 321; e->ephemL2Pflag = 0;
    e->ephemTgd = -5; e->ephemToc = 2025; e->ephemAF2 = 0;
    e->ephemAF1 = -3; e->ephemAF0 = 123456;
    e->ephemCrs = 251; e->ephemDeltaN = 13000; e->ephemM0 = -1234567890;
    e->ephemCuc = -700; e->ephemE = 40000000; e->ephemCus = 900;
    e->ephemAPowerHalf = 2702000000u; e->ephemToe = 2025;
    e->ephemFitFlag = 0; e->ephemAODA = 11; e->ephemCic = -30;
    e->ephemOmegaA0 = 987654321; e->ephemCis = 44;
    e->ephemI0 = 1200000000; e->ephemCrc = 8000;
    e->ephemW = -2000000000; e->ephemOmegaADot = -600000;
    e->ephemIDot = 1500;
    static NavModelElement_t *els[1]; els[0] = &el;
    nm.navModelList.list.array = els;
    nm.navModelList.list.count = 1;
    nm.navModelList.list.size = 1;
    ch->navigationModel = &nm;
    asn_enc_rval_t er = uper_encode_to_buffer(&asn_DEF_PDU, &pdu,
                                              out, outmax);
    if (er.encoded < 0) return -2;
    return (er.encoded + 7) / 8;
}
