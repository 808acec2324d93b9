// Firmware-semantics single-channel 1-bit GPS receiver (parity oracle).
//
// A COMPLETE acquisition -> pre-track -> tracking -> bit-extraction
// chain with the reference firmware's exact numeric semantics, driven
// over a recorded/synthesized 16.368 MHz 1-bit capture.  Used by
// tests/test_firmware_parity.py to assert that the TPU pipeline
// reproduces the firmware pipeline's nav-bit stream bit-exactly and its
// code phase / Doppler within the firmware's quantization — the
// BASELINE.md correctness line, compared pipeline-against-pipeline
// rather than each-against-planted-truth.
//
// This is a fresh implementation built from studying the reference
// (file:line cites below refer to /root/reference/Firmware/project_main);
// it deliberately reproduces the firmware's quirks because they are the
// behavior being checked against:
//
//  * the carrier NCO's binary Fs/4 patterns include the 7-digit
//    0x9999999 literal (gps_misc.c:216-217,247-248) — two samples of
//    every 32 differ from the ideal 0x99999999 pattern;
//  * gps_mult_and_summ's odd-offset path correlates one 16-bit word
//    LESS than the even path and restarts at byte 1 (gps_misc.c:57-89);
//  * gps_generate_prn_data2 writes the sub-chip-shifted replica with
//    32-bit stores so chip 1022 spills into a 1024th guard word, and
//    the first offset_bits samples stay ZERO (no circular tail)
//    (gps_misc.c:282-300, common_ram.h guard word);
//  * the PLL discriminator divides by pi but its "wrap" checks compare
//    against pi/2 on a value already inside [-0.5, 0.5]
//    (tracking.c:181-192) — mirrored as written;
//  * tracking services the channel only on its 4-of-17 TDM slots with
//    NCO phase rewind for the skipped epochs (main.c:140-152,
//    gps_misc.c:196-204).
//
// Built into libsdr_native.so (plain C ABI, ctypes-bound).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

constexpr int kBitsInPrn = 16368;      // config.h:26
constexpr int kWords = 1023;           // config.h:27 (16-bit words / ms)
constexpr int kPrnLen = 1023;          // config.h:28
constexpr int kIfHz = 4092000;         // config.h:23
constexpr float kNcoStepHz = 0.003810972f;  // config.h:53
constexpr int kTrackChLen = 4;         // config.h:56 TRACKING_CH_LENGTH
constexpr int kCodesInBit = 20;        // nav_data.c:15
constexpr int kFineRatio = 8;          // tracking.c:23 (bytes per 0.5 chip)
constexpr int kPreTrackZone = 30;      // tracking.c:17
constexpr int kPreTrackStep = kPreTrackZone / kTrackChLen;
constexpr int kPreTrackPointsMax = 30; // config.h:50
constexpr int kHistSize = 32;          // config.h:48
constexpr int kHistStep1 = 64;         // config.h:47
constexpr int kSearch2Width = 500;     // acquisition.c:15
constexpr int kSearch3Width = 60;      // acquisition.c:16
constexpr float kDll1C1 = 1.0f, kDll1C2 = 300.0f;     // config.h:61-62
constexpr float kPll1C1 = 4.0f, kPll1C2 = 3000.0f;    // config.h:64-65
constexpr float kPll2C1 = 8.0f, kPll2C2 = 5000.0f;    // config.h:67-68
constexpr float kFll1C1 = 200.0f, kFll1C2 = 2000.0f;  // config.h:70-71

const uint8_t kPreamble[8] = {1, 0, 0, 0, 1, 0, 1, 1};  // nav_data.c:26

// popcount LUT (the firmware builds a 64 KiB table at boot,
// gps_misc.c:11-38; __builtin_popcount is bit-identical)
inline int pop16(uint16_t v) { return __builtin_popcount((unsigned)v); }

// ---- C/A code generation (gps_misc.c:317-372 capability; the G2 delay
// table is the IS-GPS-200 constant set) --------------------------------
void ca_code(int prn, uint8_t* chips /*1023 of 0/1*/) {
  static const int kDelay[33] = {0,   5,   6,   7,   8,   17,  18,  139,
                                 140, 141, 251, 252, 254, 255, 256, 257,
                                 258, 469, 470, 471, 472, 473, 474, 509,
                                 512, 513, 514, 515, 516, 859, 860, 861,
                                 862};
  int8_t g1[kPrnLen], g2[kPrnLen];
  int r1[10], r2[10];
  for (int i = 0; i < 10; ++i) r1[i] = r2[i] = 1;
  for (int i = 0; i < kPrnLen; ++i) {
    g1[i] = (int8_t)r1[9];
    g2[i] = (int8_t)r2[9];
    int c1 = r1[2] ^ r1[9];
    int c2 = r2[1] ^ r2[2] ^ r2[5] ^ r2[7] ^ r2[8] ^ r2[9];
    for (int j = 9; j > 0; --j) {
      r1[j] = r1[j - 1];
      r2[j] = r2[j - 1];
    }
    r1[0] = c1;
    r2[0] = c2;
  }
  const int d = kDelay[prn];
  for (int i = 0; i < kPrnLen; ++i) {
    chips[i] = (uint8_t)(g1[i] ^ g2[(i + kPrnLen - d) % kPrnLen]);
  }
}

// ---- gps_generate_prn_data2 (gps_misc.c:282-300): code NCO, 16
// samples/chip, sub-chip shift 0..15, 32-bit stores spilling into a
// guard word; leading offset_bits samples stay zero ---------------------
void generate_prn_data2(const uint8_t* chips, uint16_t* data /*1024 words*/,
                        uint16_t offset_bits) {
  std::memset(data, 0, (kWords + 1) * 2);
  const uint32_t wr_word = 0x0000FFFFu << (offset_bits & 15);
  for (int w = 0; w < kWords; ++w) {
    if (chips[w]) {
      uint32_t cur;
      std::memcpy(&cur, &data[w], 4);
      cur |= wr_word;
      std::memcpy(&data[w], &cur, 4);
    }
  }
}

// ---- carrier NCO (gps_misc.c:211-274): 32-bit phase accumulator, XOR
// with binary Fs/4 sin/cos patterns selected by the top 2 phase bits;
// the 0x9999999 literals are the firmware's (quirk preserved) ----------
void shift_to_zero_freq(const uint8_t* signal, uint8_t* di, uint8_t* dq,
                        float freq_hz, uint32_t* accum_io) {
  static const uint32_t kSin[4] = {0x33333333u, 0x9999999u, 0xCCCCCCCCu,
                                   0x66666666u};
  static const uint32_t kCos[4] = {0x9999999u, 0xCCCCCCCCu, 0x66666666u,
                                   0x33333333u};
  uint32_t acc_step = (uint32_t)(freq_hz / kNcoStepHz);
  acc_step = (uint32_t)((uint64_t)acc_step * 32);
  uint32_t accum = accum_io ? *accum_io : 0;
  for (int w = 0; w < kWords / 2 * 2 / 2; ++w) {  // 511 32-bit words
    // NOTE: PRN_SPI_WORDS_CNT / 2 = 511 (integer division of 1023) —
    // the firmware processes 511 32-bit words = 16352 samples and
    // leaves the last 16-bit word of I/Q UNwritten each epoch
    // (gps_misc.c:229).  Quirk preserved: the stale last word carries
    // over in the shared scratch buffers.
    uint32_t sw, iw, qw;
    std::memcpy(&sw, signal + 4 * w, 4);
    const uint32_t phase = accum >> 30;
    iw = kCos[phase] ^ sw;
    qw = kSin[phase] ^ sw;
    std::memcpy(di + 4 * w, &iw, 4);
    std::memcpy(dq + 4 * w, &qw, 4);
    accum += acc_step;
  }
  if (accum_io) *accum_io = accum;
}

// gps_rewind_if_phase (gps_misc.c:196-204)
void rewind_if_phase(uint32_t* accum, float if_freq_offset_hz, int steps) {
  uint32_t acc_step = (uint32_t)(((float)kIfHz + if_freq_offset_hz) /
                                 kNcoStepHz);
  acc_step = (uint32_t)((uint64_t)acc_step * kBitsInPrn * (uint32_t)steps);
  *accum += acc_step;
}

// ---- gps_mult_and_summ (gps_misc.c:48-93) with the exact odd-offset
// semantics: odd offsets process one word less and restart at byte 1 ---
void mult_and_summ(const uint8_t* src_i, const uint8_t* src_q,
                   const uint8_t* src2, uint16_t* summ_i, uint16_t* summ_q,
                   uint16_t length, uint16_t offset) {
  const uint8_t small_offset = (uint8_t)(offset & 1);
  const uint16_t len_words_p1 = (uint16_t)((length - offset) / 2);
  uint16_t ci = 0, cq = 0;
  const uint8_t* pi = src_i + offset;
  const uint8_t* pq = src_q + offset;
  uint16_t w2, wi, wq;
  for (uint16_t i = 0; i < len_words_p1; ++i) {
    std::memcpy(&w2, src2 + 2 * i, 2);
    std::memcpy(&wi, pi + 2 * i, 2);
    std::memcpy(&wq, pq + 2 * i, 2);
    ci = (uint16_t)(ci + pop16((uint16_t)(wi ^ w2)));
    cq = (uint16_t)(cq + pop16((uint16_t)(wq ^ w2)));
  }
  pi = src_i + small_offset;
  pq = src_q + small_offset;
  uint16_t j = 0;
  for (uint16_t i = (uint16_t)(len_words_p1 + small_offset);
       i < (uint16_t)(length / 2 - small_offset); ++i, ++j) {
    std::memcpy(&w2, src2 + 2 * i, 2);
    std::memcpy(&wi, pi + 2 * j, 2);
    std::memcpy(&wq, pq + 2 * j, 2);
    ci = (uint16_t)(ci + pop16((uint16_t)(wi ^ w2)));
    cq = (uint16_t)(cq + pop16((uint16_t)(wq ^ w2)));
  }
  *summ_i = ci;
  *summ_q = cq;
}

// gps_correlation_iq (gps_misc.c:128-145)
void correlation_iq(const uint16_t* prn, const uint16_t* di,
                    const uint16_t* dq, uint16_t offset, int16_t* ri,
                    int16_t* rq) {
  uint16_t si, sq;
  mult_and_summ((const uint8_t*)di, (const uint8_t*)dq, (const uint8_t*)prn,
                &si, &sq, kWords * 2, offset);
  *ri = (int16_t)((int16_t)si - kBitsInPrn / 2);
  *rq = (int16_t)((int16_t)sq - kBitsInPrn / 2);
}

// gps_correlation8 (gps_misc.c:98-122)
int16_t correlation8(const uint16_t* prn, const uint16_t* di,
                     const uint16_t* dq, uint16_t offset) {
  int16_t s1, s2;
  correlation_iq(prn, di, dq, offset, &s1, &s2);
  if (s1 < 0) s1 = 0;
  if (s2 < 0) s2 = 0;
  const int32_t m = (int32_t)s1 * s1 + (int32_t)s2 * s2;
  return (int16_t)sqrtf((float)m);
}

// correlation_search (gps_misc.c:155-191)
uint16_t correlation_search(const uint16_t* prn, const uint16_t* di,
                            const uint16_t* dq, uint16_t start,
                            uint16_t stop, uint16_t* aver, uint16_t* phase) {
  uint16_t best_pos = 0;
  int16_t best_val = 0;
  int32_t total = 0;
  for (uint16_t off = start; off < stop; ++off) {
    const int16_t c = correlation8(prn, di, dq, off);
    if (c > best_val) {
      best_val = c;
      best_pos = off;
    }
    total += c;
  }
  total /= (kPrnLen * 2);
  if (total < 0) total = 0;
  *aver = (uint16_t)total;
  *phase = best_pos;
  return (uint16_t)best_val;
}

// ---- channel state ----------------------------------------------------
struct FwChannel {
  uint8_t prn_code[kPrnLen];
  // acquisition (code phase; frequency comes from the hint — the
  // firmware's given_freq_offset_hz path, acquisition.c:72-79)
  int acq_stage = 1;             // 1/2/3 = SEARCH1/2/3, 0 = done
  int16_t found_freq_hz = 0;
  uint16_t found_code_phase = 0;
  uint16_t search_start = 0, search_stop = 2 * kPrnLen;
  uint16_t hist_step = kHistStep1;
  uint8_t hist[kHistSize] = {0};
  // pre-track (tracking.c:398-499)
  int state = 0;  // 0 acq, 1 need-pre-track, 2 pre-track, 3 tracking
  float if_freq_offset_hz = 0.0f;
  uint16_t code_search_start = 0, code_search_stop = 0;
  uint16_t pre_track_phases[kPreTrackPointsMax] = {0};
  int pre_track_count = 0;
  uint16_t ptk_best_val = 0, ptk_best_phase = 0;
  // tracking (tracking.c:92-393)
  float code_phase_fine = 0.0f;
  float dll_code_err = 0.0f;
  float pll_code_err = 0.0f;
  float fll_err = 0.0f;
  int16_t fll_old_i = 0, fll_old_q = 0;
  uint32_t if_freq_accum = 0;
  uint32_t prev_track_timestamp = 0;
  int16_t pll_check_buf[kTrackChLen] = {0};
  int pll_bad_cnt = 0, pll_bad_master = 0;
  // nav data (nav_data.c)
  int inv_polarity_flag = 0, polarity_found = 0, inv_preamble_cnt = 0;
  uint32_t old_swap_time = 0;
  int right_period_cnt = 0, period_sync_ok = 0;
  uint8_t old_reminder = 0;
  int pos_cnt = 0, neg_cnt = 0;
  uint8_t word_buf[30] = {0};
  int word_cnt = 0, word_bit_cnt = 0;
  uint8_t oldD29 = 0, oldD30 = 0;
  uint32_t word_detection_timestamp = 0;
  uint8_t accurate_swap_ok = 0;
  uint32_t accurate_swap_time = 0;
  // per-slot scratch (nav_data.c:48-51 statics)
  uint8_t tmp_nav[kTrackChLen] = {0};
  int16_t raw_ip[kTrackChLen] = {0};
  uint32_t slot_start_time = 0;
  int subframe_count = 0;
};

// shared scratch (the common_ram.c role: 1023+1 guard word each)
struct Scratch {
  uint16_t prn[kWords + 1];
  uint16_t di[kWords + 1];
  uint16_t dq[kWords + 1];
};

struct Outputs {
  int8_t* bits;
  int32_t* bit_times;
  int32_t bit_cap, bit_cnt = 0;
  float* cp_traj;
  float* dop_traj;
  int32_t* traj_times;
  int32_t traj_cap, traj_cnt = 0;
  int32_t subframes = 0;
  int32_t track_start_ms = -1;
  int32_t sync_ms = -1;
};

// nav word framing (nav_data.c:257-350 semantics)
uint8_t check_preamble(const uint8_t* buf, int inv) {
  for (int i = 0; i < 8; ++i) {
    if (buf[i] != (kPreamble[i] ^ inv)) return 0;
  }
  return 1;
}

uint8_t word_check_parity(FwChannel& ch) {
  // nav_data.c:433-453 (IS-GPS-200 parity; destructive D30 invert of
  // bits 1-24, as the firmware does before saving the word)
  uint8_t parity[6];
  const uint8_t D29 = ch.oldD29, D30 = ch.oldD30;
  uint8_t* d = ch.word_buf - 1;
  for (int i = 1; i < 25; ++i) d[i] ^= D30;
  parity[0] = D29 ^ d[1] ^ d[2] ^ d[3] ^ d[5] ^ d[6] ^ d[10] ^ d[11] ^
              d[12] ^ d[13] ^ d[14] ^ d[17] ^ d[18] ^ d[20] ^ d[23];
  parity[1] = D30 ^ d[2] ^ d[3] ^ d[4] ^ d[6] ^ d[7] ^ d[11] ^ d[12] ^
              d[13] ^ d[14] ^ d[15] ^ d[18] ^ d[19] ^ d[21] ^ d[24];
  parity[2] = D29 ^ d[1] ^ d[3] ^ d[4] ^ d[5] ^ d[7] ^ d[8] ^ d[12] ^
              d[13] ^ d[14] ^ d[15] ^ d[16] ^ d[19] ^ d[20] ^ d[22];
  parity[3] = D30 ^ d[2] ^ d[4] ^ d[5] ^ d[6] ^ d[8] ^ d[9] ^ d[13] ^
              d[14] ^ d[15] ^ d[16] ^ d[17] ^ d[20] ^ d[21] ^ d[23];
  parity[4] = D30 ^ d[1] ^ d[3] ^ d[5] ^ d[6] ^ d[7] ^ d[9] ^ d[10] ^
              d[14] ^ d[15] ^ d[16] ^ d[17] ^ d[18] ^ d[21] ^ d[22] ^
              d[24];
  parity[5] = D29 ^ d[3] ^ d[5] ^ d[6] ^ d[8] ^ d[9] ^ d[10] ^ d[11] ^
              d[13] ^ d[15] ^ d[19] ^ d[22] ^ d[23] ^ d[24];
  return std::memcmp(d + 25, parity, 6) == 0 ? 1 : 0;
}

void words_detection(FwChannel& ch, uint8_t new_bit, uint32_t now) {
  if (ch.word_cnt == 0) {
    std::memmove(ch.word_buf, ch.word_buf + 1, 29);
    ch.word_buf[29] = new_bit;
    if (check_preamble(ch.word_buf, 0)) {
      ch.oldD29 = ch.word_buf[28];
      ch.oldD30 = ch.word_buf[29];
      ch.word_cnt = 1;
      ch.word_bit_cnt = 0;
      ch.inv_preamble_cnt = 0;
    }
    if (!ch.polarity_found && ch.word_cnt == 0) {
      if (check_preamble(ch.word_buf, 1)) ch.inv_preamble_cnt++;
      if (ch.inv_preamble_cnt >= 2) ch.inv_polarity_flag = 1;
    }
    if (ch.polarity_found) {
      if (now - ch.word_detection_timestamp > 12000) {
        ch.word_detection_timestamp = now;
        ch.polarity_found = 0;
        ch.inv_polarity_flag = 0;
      }
    }
  } else {
    ch.word_buf[ch.word_bit_cnt++] = new_bit;
    if (ch.word_bit_cnt >= 30) {
      if (word_check_parity(ch)) {
        // save D29/D30 from the (inverted) word as the firmware's
        // save_word_data does post-parity (nav_data.c:427-428)
        ch.oldD29 = ch.word_buf[28];
        ch.oldD30 = ch.word_buf[29];
        ch.word_cnt++;
        ch.word_bit_cnt = 0;
        ch.word_detection_timestamp = now;
        ch.polarity_found = 1;
        if (ch.word_cnt == 10) {
          ch.subframe_count++;
          ch.word_cnt = 0;
          std::memset(ch.word_buf, 0, 30);
        }
      } else {
        ch.word_cnt = 0;
        std::memset(ch.word_buf, 0, 30);
      }
    }
  }
}

void bits_extraction(FwChannel& ch, uint8_t short_bit, uint32_t now,
                     Outputs& out) {
  const uint32_t diff = now - ch.old_swap_time;
  const uint8_t reminder = (uint8_t)(diff % kCodesInBit);
  if (reminder < ch.old_reminder) {
    const uint8_t bit = ch.pos_cnt > ch.neg_cnt ? 1 : 0;
    if (out.bit_cnt < out.bit_cap) {
      out.bits[out.bit_cnt] = (int8_t)bit;
      // START epoch of the ended bit on the channel's 20 ms grid
      // (now - reminder is the boundary the bit ended at)
      out.bit_times[out.bit_cnt] =
          (int32_t)(now - reminder) - kCodesInBit;
      out.bit_cnt++;
    }
    words_detection(ch, bit, now);
    ch.pos_cnt = 0;
    ch.neg_cnt = 0;
  }
  if (short_bit) ch.pos_cnt++; else ch.neg_cnt++;
  ch.old_reminder = reminder;
}

// nav_data.c:46-138 per tracked epoch
void nav_analyse(FwChannel& ch, int index, int16_t new_i, uint32_t now,
                 Outputs& out) {
  uint8_t short_bit = new_i > 0 ? 1 : 0;
  if (ch.inv_polarity_flag) short_bit ^= 1;
  ch.tmp_nav[index] = short_bit;
  ch.raw_ip[index] = new_i;
  if (index == 0) ch.slot_start_time = now;
  if (ch.period_sync_ok == 1) bits_extraction(ch, short_bit, now, out);
  if (index < kTrackChLen - 1) return;

  int switches = 0, pol_change_pos = 0;
  uint8_t pol_old = ch.tmp_nav[0];
  for (int i = 1; i < kTrackChLen; ++i) {
    if (ch.tmp_nav[i] != pol_old) {
      switches++;
      pol_change_pos = i;
    }
    pol_old = ch.tmp_nav[i];
  }
  if (switches == 1) {
    const uint32_t swap_ts = ch.slot_start_time + (uint32_t)pol_change_pos;
    const uint8_t reminder =
        (uint8_t)((swap_ts - ch.old_swap_time) % kCodesInBit);
    if (reminder < 2 || reminder == kCodesInBit - 1) {
      if (ch.right_period_cnt < 10) ch.right_period_cnt++;
      if (ch.right_period_cnt > 8) {
        if (!ch.period_sync_ok && out.sync_ms < 0)
          out.sync_ms = (int32_t)swap_ts;
        ch.period_sync_ok = 1;
      }
    } else {
      if (ch.right_period_cnt > 0) ch.right_period_cnt--;
      if (ch.right_period_cnt < 3) ch.period_sync_ok = 0;
    }
    ch.old_swap_time = swap_ts;
    // accurate swap-time refinement (nav_data.c:133-218) feeds only
    // the subframe-time ledger, which the parity harness does not
    // compare — omitted.
  }
}

// tracking.c:92-170 per tracked epoch (index 0..3)
void tracking_step(FwChannel& ch, const uint8_t* data, int index,
                   uint32_t now, Scratch& s, Outputs& out) {
  uint32_t diff_ticks = now - ch.prev_track_timestamp;
  ch.prev_track_timestamp = now;
  if (diff_ticks > 50) diff_ticks = 1;
  if (diff_ticks != 1)
    rewind_if_phase(&ch.if_freq_accum, ch.if_freq_offset_hz,
                    (int)(diff_ticks - 1));

  const int16_t fine = (int16_t)ch.code_phase_fine;
  const uint16_t offset_bits = (uint16_t)(fine & (kFineRatio - 1));
  generate_prn_data2(ch.prn_code, s.prn, offset_bits);
  shift_to_zero_freq(data, (uint8_t*)s.di, (uint8_t*)s.dq,
                     (float)kIfHz + ch.if_freq_offset_hz,
                     &ch.if_freq_accum);

  const uint16_t off_p = (uint16_t)(fine / kFineRatio);
  uint16_t off_e = (uint16_t)(off_p - 1);
  uint16_t off_l = (uint16_t)(off_p + 1);
  if (off_e >= 2 * kPrnLen) off_e = 2 * kPrnLen - 1;
  if (off_l >= 2 * kPrnLen) off_l = 0;

  int16_t IE, QE, IP, QP, IL, QL;
  correlation_iq(s.prn, s.di, s.dq, off_e, &IE, &QE);
  correlation_iq(s.prn, s.di, s.dq, off_p, &IP, &QP);
  correlation_iq(s.prn, s.di, s.dq, off_l, &IL, &QL);

  // DLL (tracking.c:333-393) — every slot
  {
    const int32_t e2 = (int32_t)IE * IE + (int32_t)QE * QE;
    const int32_t l2 = (int32_t)IL * IL + (int32_t)QL * QL;
    const float code_err = -((float)(e2 - l2) / (float)(e2 + l2));
    ch.code_phase_fine += kDll1C1 * (code_err - ch.dll_code_err) +
                          kDll1C2 * 0.001f * code_err;
    if (ch.code_phase_fine < 0.0f)
      ch.code_phase_fine =
          (float)(kPrnLen * 2 * kFineRatio) - ch.code_phase_fine;
    else if (ch.code_phase_fine > (float)(kPrnLen * 2 * kFineRatio))
      ch.code_phase_fine -= (float)(kPrnLen * 2 * kFineRatio);
    ch.dll_code_err = code_err;
  }

  // PLL (tracking.c:175-209) — applied on slot 0 only
  {
    float err;
    if (IP > 0)
      err = atan2f((float)QP, (float)IP) / (float)M_PI;
    else
      err = (float)(atan2((double)-QP, (double)-IP) / M_PI);
    if (index == 0) {
      float diff_old = err - ch.pll_code_err;
      if (diff_old > (float)M_PI / 2) diff_old = (float)M_PI - diff_old;
      if (diff_old < -(float)M_PI / 2) diff_old = -(float)M_PI - diff_old;
      if (ch.period_sync_ok)
        ch.if_freq_offset_hz -= kPll2C1 * diff_old + kPll2C2 * 0.001f * err;
      else
        ch.if_freq_offset_hz -= kPll1C1 * diff_old + kPll1C2 * 0.001f * err;
      ch.pll_code_err = err;
    }
  }

  // watchdog (tracking.c:261-327)
  {
    ch.pll_check_buf[index] = IP;
    if (index == kTrackChLen - 1) {
      int switches = 0;
      int pol_old = ch.pll_check_buf[0] > 0 ? 1 : 0;
      for (int i = 1; i < kTrackChLen; ++i) {
        const int pol = ch.pll_check_buf[i] > 0 ? 1 : 0;
        if (pol != pol_old) switches++;
        pol_old = pol;
      }
      if (switches > 1) {
        if (++ch.pll_bad_cnt > 10) ch.pll_bad_cnt = 10;
      } else if (ch.pll_bad_cnt > 0) {
        ch.pll_bad_cnt--;
      }
      if (ch.pll_bad_cnt > 9) ch.pll_bad_master++;
      else if (ch.pll_bad_cnt == 0) ch.pll_bad_master = 0;
      if (ch.pll_bad_master > 80) {
        ch.pll_bad_master = 0;
        ch.pll_bad_cnt = 0;
        int16_t diff_hz, new_off;
        do {
          const uint16_t r = (uint16_t)(rand() % 500);
          new_off = (int16_t)(ch.found_freq_hz - r + 250);
          diff_hz = (int16_t)ch.if_freq_offset_hz - new_off;
        } while (abs(diff_hz) < 200);
        ch.if_freq_offset_hz = (float)new_off;
      }
    }
  }

  // FLL (tracking.c:214-256) — slot 0 only latches old I/Q
  if (index == 0) {
    ch.fll_old_i = IP;
    ch.fll_old_q = QP;
  } else {
    const float f1 = IP == 0 ? (float)M_PI / 2
                             : atanf((float)QP / (float)IP);
    const float f2 = ch.fll_old_i == 0
                         ? (float)M_PI / 2
                         : atanf((float)ch.fll_old_q / (float)ch.fll_old_i);
    float fd = f1 - f2;
    if (fd > (float)M_PI / 2) fd = (float)M_PI - fd;
    if (fd < -(float)M_PI / 2) fd = -(float)M_PI - fd;
    float od = fd - ch.fll_err;
    if (od > (float)M_PI / 2) od = (float)M_PI - od;
    if (od < -(float)M_PI / 2) od = -(float)M_PI - od;
    ch.if_freq_offset_hz -= kFll1C1 * 0.001f * od + kFll1C2 * 0.001f * fd;
    ch.fll_old_i = IP;
    ch.fll_old_q = QP;
    ch.fll_err = fd;
  }

  nav_analyse(ch, index, IP, now, out);

  if (index == 0 && out.traj_cnt < out.traj_cap) {
    out.cp_traj[out.traj_cnt] = ch.code_phase_fine;
    out.dop_traj[out.traj_cnt] = ch.if_freq_offset_hz;
    out.traj_times[out.traj_cnt] = (int32_t)now;
    out.traj_cnt++;
  }
}

// pre-track (tracking.c:398-499)
void pre_track_step(FwChannel& ch, const uint8_t* data, int index,
                    Scratch& s) {
  generate_prn_data2(ch.prn_code, s.prn, 0);
  shift_to_zero_freq(data, (uint8_t*)s.di, (uint8_t*)s.dq,
                     (float)kIfHz + ch.if_freq_offset_hz, nullptr);
  uint16_t start = (uint16_t)(ch.code_search_start + index * kPreTrackStep);
  uint16_t stop = (uint16_t)(start + kPreTrackStep);
  if (stop > 2 * kPrnLen) stop = 2 * kPrnLen;
  for (uint16_t idx = start; idx < stop; ++idx) {
    const int16_t c = correlation8(s.prn, s.di, s.dq, idx);
    if (c > (int16_t)ch.ptk_best_val) {
      ch.ptk_best_val = (uint16_t)c;
      ch.ptk_best_phase = idx;
    }
  }
  if (index == kTrackChLen - 1) {
    ch.pre_track_phases[ch.pre_track_count++] = ch.ptk_best_phase;
    if (ch.pre_track_count > kPreTrackPointsMax - 10) {
      // sort + longest chain of identical phases (tracking.c:459-499)
      uint16_t* p = ch.pre_track_phases;
      const int n = ch.pre_track_count;
      for (int i = 1; i < n; ++i) {  // insertion sort (qsort semantics)
        const uint16_t v = p[i];
        int j = i - 1;
        while (j >= 0 && p[j] > v) {
          p[j + 1] = p[j];
          --j;
        }
        p[j + 1] = v;
      }
      int chain = 0, max_chain = 0;
      uint16_t found = 0;
      for (int i = 1; i < n; ++i) {
        if (p[i] == p[i - 1]) {
          chain++;
        } else {
          if (chain > max_chain) {
            max_chain = chain;
            found = p[i - 1];
          }
          chain = 0;
        }
      }
      if (chain > max_chain) {
        max_chain = chain;
        found = p[n - 1];
      }
      if (found) {
        ch.code_phase_fine = (float)(found * kFineRatio);
        ch.state = 3;
      }
    }
    if (ch.pre_track_count >= kPreTrackPointsMax) {
      ch.pre_track_count = 0;
      std::memset(ch.pre_track_phases, 0, sizeof(ch.pre_track_phases));
    }
    ch.ptk_best_val = 0;
  }
}

// acquisition code-phase search stages (acquisition.c:196-275)
void acq_step(FwChannel& ch, const uint8_t* data, Scratch& s) {
  generate_prn_data2(ch.prn_code, s.prn, 0);
  shift_to_zero_freq(data, (uint8_t*)s.di, (uint8_t*)s.dq,
                     (float)(kIfHz + ch.found_freq_hz), nullptr);
  uint16_t aver, best = 0;
  correlation_search(s.prn, s.di, s.dq, ch.search_start, ch.search_stop,
                     &aver, &best);
  if (best < ch.search_start || best >= ch.search_stop) return;
  const uint8_t idx = (uint8_t)((best - ch.search_start) / ch.hist_step);
  if (idx < kHistSize && ch.hist[idx] < 255) ch.hist[idx]++;

  uint8_t max_val = 0, max_pos = 0, unique = 0;
  const uint16_t hist_len =
      (uint16_t)((ch.search_stop + 2 - ch.search_start) / ch.hist_step);
  for (uint8_t i = 0; i < hist_len && i < kHistSize; ++i) {
    if (ch.hist[i] > max_val) {
      max_val = ch.hist[i];
      max_pos = i;
    }
    if (ch.hist[i] > 0) unique++;
  }
  if (max_val < 2) return;
  float total = 0.0f;
  uint8_t nz = 0;
  for (uint8_t i = 0; i < hist_len && i < kHistSize; ++i) {
    if (ch.hist[i] > 0) {
      total += ch.hist[i];
      nz++;
    }
  }
  const float avr = nz ? total / (float)nz : 0.0f;
  if (avr < 0.01f) return;
  float ratio = (float)max_val / avr;
  if (unique == 1 && max_val > 3) ratio = 10.0f;
  if (ratio <= 3.2f) return;

  ch.found_code_phase =
      (uint16_t)(ch.search_start + max_pos * ch.hist_step);
  std::memset(ch.hist, 0, sizeof(ch.hist));
  if (ch.acq_stage == 1) {
    ch.search_start = (uint16_t)(ch.found_code_phase - kSearch2Width / 2);
    ch.search_stop = (uint16_t)(ch.found_code_phase + kSearch2Width / 2);
    if (ch.search_start > 2 * kPrnLen) ch.search_start = 0;
    if (ch.search_stop > 2 * kPrnLen) ch.search_stop = 2 * kPrnLen;
    ch.hist_step = kSearch2Width / kHistSize + 1;
    ch.acq_stage = 2;
  } else if (ch.acq_stage == 2) {
    ch.search_start = (uint16_t)(ch.found_code_phase - kSearch3Width / 2);
    ch.search_stop = (uint16_t)(ch.found_code_phase + kSearch3Width / 2);
    if (ch.search_start > 2 * kPrnLen) ch.search_start = 0;
    if (ch.search_stop > 2 * kPrnLen) ch.search_stop = 2 * kPrnLen;
    ch.hist_step = kSearch3Width / kHistSize + 1;
    ch.acq_stage = 3;
  } else {
    ch.acq_stage = 0;  // GPS_ACQ_DONE
    // hand off to pre-track (tracking.c:52-72)
    ch.code_search_start =
        (uint16_t)(ch.found_code_phase - kPreTrackZone / 2);
    ch.code_search_stop =
        (uint16_t)(ch.found_code_phase + kPreTrackZone / 2);
    if (ch.code_search_start > 2 * kPrnLen) ch.code_search_start = 0;
    if (ch.code_search_stop > 2 * kPrnLen)
      ch.code_search_stop = 2 * kPrnLen;
    ch.if_freq_offset_hz = (float)ch.found_freq_hz;
    ch.state = 2;
  }
}

}  // namespace

extern "C" {

// Run the firmware-semantics receiver over a packed 1-bit capture.
//
// capture: n_ms * 2046 bytes (1023 uint16 LSB-first words per ms, the
// SPI wire format).  doppler_hint_hz plays the firmware's
// given_freq_offset_hz role (acquisition.c:72-79) — the frequency
// search is hint-seeded exactly as a user hint would in main.c:59-73.
// Outputs: nav bits (post-polarity, as fed to words_detection) with
// their emission epoch, slot-0 code-phase/Doppler trajectories (fine
// units / Hz), counts, and milestone epochs.  Returns 0 on success.
int32_t fw_rx_run(const uint8_t* capture, int64_t n_ms, int32_t prn,
                  int32_t doppler_hint_hz,
                  int8_t* bits, int32_t* bit_times, int32_t bit_cap,
                  int32_t* n_bits,
                  float* cp_traj, float* dop_traj, int32_t* traj_times,
                  int32_t traj_cap, int32_t* n_traj,
                  int32_t* acq_code_phase, int32_t* track_start_ms,
                  int32_t* sync_ms, int32_t* n_subframes) {
  if (prn < 1 || prn > 32) return -1;
  FwChannel ch;
  ca_code(prn, ch.prn_code);
  ch.found_freq_hz = (int16_t)doppler_hint_hz;
  Scratch s;
  std::memset(&s, 0, sizeof(s));
  Outputs out;
  out.bits = bits;
  out.bit_times = bit_times;
  out.bit_cap = bit_cap;
  out.cp_traj = cp_traj;
  out.dop_traj = dop_traj;
  out.traj_times = traj_times;
  out.traj_cap = traj_cap;
  srand(1);  // the watchdog kick's rand() — deterministic runs

  for (int64_t ms = 0; ms < n_ms; ++ms) {
    const uint8_t* data = capture + ms * (kWords * 2);
    if (ch.state == 0) {
      acq_step(ch, data, s);
      continue;
    }
    // TDM: this channel owns superframe slots 0..3 (main.c:140-152)
    const int idx_big = (int)(ms % 17);
    if (idx_big >= kTrackChLen) continue;
    if (ch.state == 2) {
      pre_track_step(ch, data, idx_big, s);
      if (ch.state == 3) out.track_start_ms = (int32_t)ms;
    } else if (ch.state == 3) {
      tracking_step(ch, data, idx_big, (uint32_t)ms, s, out);
    }
  }
  *n_bits = out.bit_cnt;
  *n_traj = out.traj_cnt;
  *acq_code_phase = ch.acq_stage == 0 ? ch.found_code_phase : -1;
  *track_start_ms = out.track_start_ms;
  *sync_ms = out.sync_ms;
  *n_subframes = ch.subframe_count;
  return ch.state == 3 ? 0 : 1;
}

}  // extern "C"
