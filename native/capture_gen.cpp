// capture_gen — independent GPS L1 C/A RF capture generator.
//
// Synthesizes the reference front-end's wire format (1-bit real sign
// samples at 16.368 MHz, IF 4.092 MHz, packed LSB-first into 16-bit
// words — the MAX2769 stream of signal_capture.c:9-11,143-177) for a
// physically modeled multi-satellite scene: Keplerian orbits
// (IS-GPS-200 20.3.3.4.3), SV clock polynomial + relativistic
// correction, light-time iteration with Sagnac (earth-rotation)
// correction, LNAV subframes 1-3 with full parity chaining
// (IS-GPS-200 20.3.2/20.3.3, Table 20-XIV), C/A Gold codes from the
// G1/G2 LFSR definition (IS-GPS-200 3.3.2.3).
//
// This program intentionally shares NO code with the Python package:
// it is an independent implementation of the same public ICD, built
// as the replay-validation counterpart of the reference project's
// recorded-capture methodology (PC_SpiLight/Readme.txt:1-4).  The
// receiver must acquire, track, frame, decode ephemeris, and solve a
// position from this stream knowing nothing but the PRN list —
// agreement with the planted truth cross-validates both
// implementations of the ICD (tests/test_independent_capture.py).
//
// Usage:
//   capture_gen --out cap.bin --truth truth.json [--cib 20]
//               [--duration-ms 32000] [--cn0 48] [--seed 7]
//               [--repeats 2]
//
// Truth JSON carries the planted receiver ECEF/LLA, the per-satellite
// delay/Doppler at t=0, elevations, and the field-quantized ephemeris
// actually broadcast.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// constants (WGS-84 / IS-GPS-200)
// ---------------------------------------------------------------------------
constexpr double C_LIGHT = 299792458.0;
constexpr double MU = 3.986005e14;          // WGS-84 GM, m^3/s^2
constexpr double OMGE = 7.2921151467e-5;    // earth rotation, rad/s
constexpr double F_REL = -4.442807633e-10;  // relativistic clock, s/m^0.5
constexpr double PI_GPS = 3.1415926535898;  // IS-GPS-200 pi
constexpr double F_L1 = 1.57542e9;
constexpr double F_IF = 4.092e6;
constexpr double FS = 16.368e6;
constexpr double CHIP_RATE = 1.023e6;
constexpr int CODE_LEN = 1023;
constexpr double WGS_A = 6378137.0;
constexpr double WGS_E2 = 6.69437999014e-3;

// ---------------------------------------------------------------------------
// C/A Gold code: G1 (1+x^3+x^10), G2 (1+x^2+x^3+x^6+x^8+x^9+x^10),
// chip = G1[10] xor G2[t1] xor G2[t2]  (IS-GPS-200 3.3.2.3)
// ---------------------------------------------------------------------------
const int G2_TAPS[33][2] = {
    {0, 0},  {2, 6},  {3, 7},  {4, 8},  {5, 9},  {1, 9},  {2, 10}, {1, 8},
    {2, 9},  {3, 10}, {2, 3},  {3, 4},  {5, 6},  {6, 7},  {7, 8},  {8, 9},
    {9, 10}, {1, 4},  {2, 5},  {3, 6},  {4, 7},  {5, 8},  {6, 9},  {1, 3},
    {4, 6},  {5, 7},  {6, 8},  {7, 9},  {8, 10}, {1, 6},  {2, 7},  {3, 8},
    {4, 9}};

std::vector<int8_t> ca_code(int prn) {
  int g1[11], g2[11];
  for (int i = 1; i <= 10; ++i) g1[i] = g2[i] = 1;
  const int t1 = G2_TAPS[prn][0], t2 = G2_TAPS[prn][1];
  std::vector<int8_t> chips(CODE_LEN);
  for (int i = 0; i < CODE_LEN; ++i) {
    const int bit = g1[10] ^ g2[t1] ^ g2[t2];
    chips[i] = static_cast<int8_t>(1 - 2 * bit);  // BPSK: 0 -> +1, 1 -> -1
    const int f1 = g1[3] ^ g1[10];
    const int f2 = g2[2] ^ g2[3] ^ g2[6] ^ g2[8] ^ g2[9] ^ g2[10];
    for (int k = 10; k > 1; --k) {
      g1[k] = g1[k - 1];
      g2[k] = g2[k - 1];
    }
    g1[1] = f1;
    g2[1] = f2;
  }
  return chips;
}

// ---------------------------------------------------------------------------
// LNAV parity (IS-GPS-200 Table 20-XIV): D25..D30 from source d1..d24
// and the previous word's D29*/D30*; transmitted data = d xor D30*.
// ---------------------------------------------------------------------------
const int PAR_TAPS[6][15] = {
    {1, 2, 3, 5, 6, 10, 11, 12, 13, 14, 17, 18, 20, 23, 0},
    {2, 3, 4, 6, 7, 11, 12, 13, 14, 15, 18, 19, 21, 24, 0},
    {1, 3, 4, 5, 7, 8, 12, 13, 14, 15, 16, 19, 20, 22, 0},
    {2, 4, 5, 6, 8, 9, 13, 14, 15, 16, 17, 20, 21, 23, 0},
    {1, 3, 5, 6, 7, 9, 10, 14, 15, 16, 17, 18, 21, 22, 24},
    {3, 5, 6, 8, 9, 10, 11, 13, 15, 19, 22, 23, 24, 0, 0}};
const int PAR_SEED[6] = {29, 30, 29, 30, 30, 29};  // which D* seeds eqn k

void word_parity(const int d[24], int d29s, int d30s, int par[6]) {
  for (int k = 0; k < 6; ++k) {
    int p = (PAR_SEED[k] == 29) ? d29s : d30s;
    for (int j = 0; j < 15 && PAR_TAPS[k][j]; ++j) p ^= d[PAR_TAPS[k][j] - 1];
    par[k] = p;
  }
}

// Encode one 24-bit source word into 30 transmitted bits, advancing the
// (d29, d30) chain.  If solve_tail, choose d23/d24 so D29 = D30 = 0
// (HOW and word-10 non-information bits, IS-GPS-200 20.3.3.2).
void encode_word(int d[24], bool solve_tail, int &d29, int &d30,
                 std::vector<int8_t> &out) {
  int par[6];
  if (solve_tail) {
    for (int c = 0; c < 4; ++c) {
      d[22] = c >> 1;
      d[23] = c & 1;
      word_parity(d, d29, d30, par);
      if (par[4] == 0 && par[5] == 0) break;
    }
  }
  word_parity(d, d29, d30, par);
  for (int i = 0; i < 24; ++i)
    out.push_back(static_cast<int8_t>(d[i] ^ d30));
  for (int k = 0; k < 6; ++k) out.push_back(static_cast<int8_t>(par[k]));
  d29 = par[4];
  d30 = par[5];
}

// ---------------------------------------------------------------------------
// ephemeris: field-quantized broadcast values
// ---------------------------------------------------------------------------
struct Eph {
  int prn = 0, week = 0, iodc = 0, iode = 0, sva = 0, svh = 0, code_l2 = 1;
  double tgd = 0, toc = 0, f0 = 0, f1 = 0, f2 = 0;
  double crs = 0, deln = 0, M0 = 0, cuc = 0, e = 0, cus = 0, sqrtA = 0;
  double toes = 0, cic = 0, OMG0 = 0, cis = 0, i0 = 0, crc = 0, omg = 0;
  double OMGd = 0, idot = 0;
};

double quant(double v, double scale) { return std::round(v / scale) * scale; }
// Signed semicircle fields span exactly [-1, 1) sc; wrap so the stored
// truth equals what the two's-complement field actually represents.
double wrap_sc(double sc) {
  sc = std::fmod(sc + 1.0, 2.0);
  if (sc < 0) sc += 2.0;
  return sc - 1.0;
}
long long enc(double v, double scale) {
  return static_cast<long long>(std::llround(v / scale));
}

// Snap every field to its LNAV grid so the signal is synthesized from
// EXACTLY what the bits broadcast (Table 20-IV scale factors).
void quantize(Eph &e) {
  const double P5 = std::ldexp(1.0, -5), P19 = std::ldexp(1.0, -19);
  const double P29 = std::ldexp(1.0, -29), P31 = std::ldexp(1.0, -31);
  const double P33 = std::ldexp(1.0, -33), P43 = std::ldexp(1.0, -43);
  const double P55 = std::ldexp(1.0, -55);
  e.tgd = quant(e.tgd, P31);
  e.toc = quant(e.toc, 16.0);
  e.f0 = quant(e.f0, P31);
  e.f1 = quant(e.f1, P43);
  e.f2 = quant(e.f2, P55);
  e.crs = quant(e.crs, P5);
  e.crc = quant(e.crc, P5);
  e.deln = quant(e.deln / PI_GPS, P43) * PI_GPS;      // rad -> semicircles grid
  e.M0 = quant(wrap_sc(e.M0 / PI_GPS), P31) * PI_GPS;
  e.OMG0 = quant(wrap_sc(e.OMG0 / PI_GPS), P31) * PI_GPS;
  e.i0 = quant(wrap_sc(e.i0 / PI_GPS), P31) * PI_GPS;
  e.omg = quant(wrap_sc(e.omg / PI_GPS), P31) * PI_GPS;
  e.OMGd = quant(e.OMGd / PI_GPS, P43) * PI_GPS;
  e.idot = quant(e.idot / PI_GPS, P43) * PI_GPS;
  e.cuc = quant(e.cuc, P29);
  e.cus = quant(e.cus, P29);
  e.cic = quant(e.cic, P29);
  e.cis = quant(e.cis, P29);
  e.e = quant(e.e, P33);
  e.sqrtA = quant(e.sqrtA, P19);
  e.toes = quant(e.toes, 16.0);
}

// ---------------------------------------------------------------------------
// LNAV subframe assembly (IS-GPS-200 20.3.3; field positions match the
// firmware decoder nav_data_decode.c:53-141 because both follow the ICD)
// ---------------------------------------------------------------------------
struct SfBuilder {
  int data[10][24] = {};  // source bits, word-major

  void put(int pos, int len, unsigned long long v) {
    for (int i = 0; i < len; ++i) {
      const int p = pos + i, w = p / 30, k = p % 30;
      data[w][k] = static_cast<int>((v >> (len - 1 - i)) & 1ULL);
    }
  }
  void put_s(int pos, int len, long long v) {
    put(pos, len, static_cast<unsigned long long>(v) &
                      ((len < 64) ? ((1ULL << len) - 1) : ~0ULL));
  }
};

// One 300-bit subframe.  tow6 = TOW count of the NEXT subframe's
// leading edge in 6 s units (the HOW convention).
void build_subframe(int sf_id, int tow6, const Eph &e, int &d29, int &d30,
                    std::vector<int8_t> &out) {
  const double P5 = std::ldexp(1.0, -5), P19 = std::ldexp(1.0, -19);
  const double P29 = std::ldexp(1.0, -29), P31 = std::ldexp(1.0, -31);
  const double P33 = std::ldexp(1.0, -33), P43 = std::ldexp(1.0, -43);
  const double P55 = std::ldexp(1.0, -55);
  SfBuilder b;
  // word 1: TLM — preamble 10001011, 14-bit message, 2 reserved
  b.put(0, 8, 0x8B);
  // word 2: HOW — TOW(17), alert(1), AS(1), id(3), 2 solved bits
  b.put(30, 17, static_cast<unsigned>(tow6));
  b.put(47, 1, 0);
  b.put(48, 1, 0);
  b.put(49, 3, static_cast<unsigned>(sf_id));
  if (sf_id == 1) {
    b.put(60, 10, static_cast<unsigned>(e.week % 1024));
    b.put(70, 2, static_cast<unsigned>(e.code_l2));
    b.put(72, 4, static_cast<unsigned>(e.sva));
    b.put(76, 6, static_cast<unsigned>(e.svh));
    b.put(82, 2, static_cast<unsigned>((e.iodc >> 8) & 0x3));
    b.put(90, 1, 0);                       // L2 P data flag
    b.put_s(196, 8, enc(e.tgd, P31));
    b.put(210, 8, static_cast<unsigned>(e.iodc & 0xFF));  // IODC LSBs
    b.put(218, 16, static_cast<unsigned>(enc(e.toc, 16.0)));
    b.put_s(240, 8, enc(e.f2, P55));
    b.put_s(248, 16, enc(e.f1, P43));
    b.put_s(270, 22, enc(e.f0, P31));
  } else if (sf_id == 2) {
    b.put(60, 8, static_cast<unsigned>(e.iode));
    b.put_s(68, 16, enc(e.crs, P5));
    b.put_s(90, 16, enc(e.deln / PI_GPS, P43));
    const long long m0 = enc(e.M0 / PI_GPS, P31);
    b.put_s(106, 8, (m0 >> 24) & 0xFF);
    b.put(120, 24, static_cast<unsigned long long>(m0) & 0xFFFFFF);
    b.put_s(150, 16, enc(e.cuc, P29));
    const long long ec = enc(e.e, P33);
    b.put(166, 8, (ec >> 24) & 0xFF);
    b.put(180, 24, static_cast<unsigned long long>(ec) & 0xFFFFFF);
    b.put_s(210, 16, enc(e.cus, P29));
    const long long sa = enc(e.sqrtA, P19);
    b.put(226, 8, (sa >> 24) & 0xFF);
    b.put(240, 24, static_cast<unsigned long long>(sa) & 0xFFFFFF);
    b.put(270, 16, static_cast<unsigned>(enc(e.toes, 16.0)));
    b.put(286, 1, 0);                      // fit interval flag
    b.put(287, 5, 0);                      // AODO
  } else if (sf_id == 3) {
    b.put_s(60, 16, enc(e.cic, P29));
    const long long og = enc(e.OMG0 / PI_GPS, P31);
    b.put_s(76, 8, (og >> 24) & 0xFF);
    b.put(90, 24, static_cast<unsigned long long>(og) & 0xFFFFFF);
    b.put_s(120, 16, enc(e.cis, P29));
    const long long ii = enc(e.i0 / PI_GPS, P31);
    b.put_s(136, 8, (ii >> 24) & 0xFF);
    b.put(150, 24, static_cast<unsigned long long>(ii) & 0xFFFFFF);
    b.put_s(180, 16, enc(e.crc, P5));
    const long long om = enc(e.omg / PI_GPS, P31);
    b.put_s(196, 8, (om >> 24) & 0xFF);
    b.put(210, 24, static_cast<unsigned long long>(om) & 0xFFFFFF);
    b.put_s(240, 24, enc(e.OMGd / PI_GPS, P43));
    b.put(270, 8, static_cast<unsigned>(e.iode));
    b.put_s(278, 14, enc(e.idot / PI_GPS, P43));
  } else {
    // subframes 4/5: valid TLM/HOW/parity, alternating-bit data words
    for (int w = 2; w < 10; ++w)
      for (int k = 0; k < 22; ++k) b.data[w][k] = k & 1;
  }
  for (int w = 0; w < 10; ++w)
    encode_word(b.data[w], w == 1 || w == 9, d29, d30, out);
}

// ---------------------------------------------------------------------------
// orbit model (IS-GPS-200 20.3.3.4.3 user algorithm)
// ---------------------------------------------------------------------------
struct SatState {
  double pos[3];
  double dts;  // SV clock offset incl. relativistic term, s
};

SatState eph_pos(const Eph &e, double t /* TOW seconds */) {
  const double A = e.sqrtA * e.sqrtA;
  const double n = std::sqrt(MU / (A * A * A)) + e.deln;
  double tk = t - e.toes;
  const double M = e.M0 + n * tk;
  double E = M;
  for (int i = 0; i < 12; ++i) {
    const double dE = (M - E + e.e * std::sin(E)) / (1.0 - e.e * std::cos(E));
    E += dE;
    if (std::fabs(dE) < 1e-14) break;
  }
  const double sE = std::sin(E), cE = std::cos(E);
  const double v = std::atan2(std::sqrt(1.0 - e.e * e.e) * sE, cE - e.e);
  const double u0 = v + e.omg;
  const double s2u = std::sin(2.0 * u0), c2u = std::cos(2.0 * u0);
  const double u = u0 + e.cus * s2u + e.cuc * c2u;
  const double r = A * (1.0 - e.e * cE) + e.crs * s2u + e.crc * c2u;
  const double inc = e.i0 + e.idot * tk + e.cis * s2u + e.cic * c2u;
  const double OMG =
      e.OMG0 + (e.OMGd - OMGE) * tk - OMGE * e.toes;
  const double xp = r * std::cos(u), yp = r * std::sin(u);
  const double sO = std::sin(OMG), cO = std::cos(OMG);
  const double si = std::sin(inc), ci = std::cos(inc);
  SatState s;
  s.pos[0] = xp * cO - yp * ci * sO;
  s.pos[1] = xp * sO + yp * ci * cO;
  s.pos[2] = yp * si;
  const double tc = t - e.toc;
  s.dts = e.f0 + e.f1 * tc + e.f2 * tc * tc + F_REL * e.e * e.sqrtA * sE;
  return s;
}

// Apparent signal delay tau at receive TOW t: light-time iteration with
// the Sagnac rotation term, minus the SV clock offset (the broadcast
// chip/bit grid runs on the SV clock, so a fast SV clock makes the
// signal appear EARLY — same convention as an RTKLIB pseudorange).
double signal_delay(const Eph &e, const double rr[3], double t) {
  double tau = 0.075;
  for (int i = 0; i < 4; ++i) {
    const SatState s = eph_pos(e, t - tau);
    const double dx = s.pos[0] - rr[0], dy = s.pos[1] - rr[1],
                 dz = s.pos[2] - rr[2];
    double range = std::sqrt(dx * dx + dy * dy + dz * dz);
    range += OMGE * (s.pos[0] * rr[1] - s.pos[1] * rr[0]) / C_LIGHT;
    tau = range / C_LIGHT - s.dts;
  }
  return tau;
}

void pos2ecef(double lat, double lon, double h, double out[3]) {
  const double sl = std::sin(lat), cl = std::cos(lat);
  const double N = WGS_A / std::sqrt(1.0 - WGS_E2 * sl * sl);
  out[0] = (N + h) * cl * std::cos(lon);
  out[1] = (N + h) * cl * std::sin(lon);
  out[2] = (N * (1.0 - WGS_E2) + h) * sl;
}

double elevation_deg(const double rr[3], const double rs[3], double lat,
                     double lon) {
  const double dx = rs[0] - rr[0], dy = rs[1] - rr[1], dz = rs[2] - rr[2];
  const double sl = std::sin(lat), cl = std::cos(lat);
  const double so = std::sin(lon), co = std::cos(lon);
  const double eN = -sl * co * dx - sl * so * dy + cl * dz;
  const double eE = -so * dx + co * dy;
  const double eU = cl * co * dx + cl * so * dy + sl * dz;
  return std::atan2(eU, std::sqrt(eN * eN + eE * eE)) * 180.0 / M_PI;
}

}  // namespace

// ---------------------------------------------------------------------------
// main
// ---------------------------------------------------------------------------
int main(int argc, char **argv) {
  std::string out_path = "capture.bin", truth_path = "truth.json";
  int cib = 20;              // code periods per nav bit (20 = real GPS)
  int duration_ms = 32000;
  double cn0_dbhz = 48.0;
  unsigned seed = 7;
  int repeats = 2;
  double lat_deg = 51.5, lon_deg = -0.1, h_m = 80.0;
  // receiver-side RF impairments (all default off; independent
  // implementation of the same effect classes as
  // signal/simulator.Impairments — see that docstring for the physics)
  double tcxo_ppm = 0.0, tcxo_drift = 0.0;   // fractional clock error
  double pn_rad2_s = 0.0;                    // oscillator phase noise
  double fe_bw_hz = 0.0;                     // IF band-pass bandwidth
  double dc_offset = 0.0;                    // in noise sigmas
  int mp_prn = 0;                            // two-ray multipath target
  double mp_delay_chips = 0.0, mp_amp = 0.0, mp_phase = 0.0;
  for (int i = 1; i < argc - 1; ++i) {
    if (!std::strcmp(argv[i], "--out")) out_path = argv[++i];
    else if (!std::strcmp(argv[i], "--truth")) truth_path = argv[++i];
    else if (!std::strcmp(argv[i], "--cib")) cib = std::atoi(argv[++i]);
    else if (!std::strcmp(argv[i], "--duration-ms"))
      duration_ms = std::atoi(argv[++i]);
    else if (!std::strcmp(argv[i], "--cn0")) cn0_dbhz = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--seed"))
      seed = static_cast<unsigned>(std::atoi(argv[++i]));
    else if (!std::strcmp(argv[i], "--repeats"))
      repeats = std::atoi(argv[++i]);
    else if (!std::strcmp(argv[i], "--lat")) lat_deg = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--lon")) lon_deg = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--height")) h_m = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--tcxo-ppm"))
      tcxo_ppm = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--tcxo-drift-ppm-s"))
      tcxo_drift = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--phase-noise-rad2-s"))
      pn_rad2_s = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--frontend-bw-hz"))
      fe_bw_hz = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--dc-offset"))
      dc_offset = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--multipath")) {
      // prn,delay_chips,amp,phase_cycles
      int p = 0; double d = 0, a = 0, ph = 0;
      if (std::sscanf(argv[++i], "%d,%lf,%lf,%lf", &p, &d, &a, &ph) == 4) {
        mp_prn = p; mp_delay_chips = d; mp_amp = a; mp_phase = ph;
      }
    }
  }

  // ---- scenario: 4 satellites of one constellation shell ------------------
  const int week = 2290;
  const double toes = 352800.0;
  const int n_sat = 4;
  // Geometry chosen so all four are visible from the default site
  // (51.5N, 0.1W): elevations ~25/46/46/80 deg, azimuths ~47/135/225/301.
  const int PRNS[n_sat] = {2, 7, 15, 24};
  const double M0S[n_sat] = {0.80, 1.90, 1.90, 0.85};
  const double OMG0S[n_sat] = {0.75, 4.50, 3.60, 5.10};

  std::vector<Eph> ephs(n_sat);
  for (int i = 0; i < n_sat; ++i) {
    Eph &e = ephs[i];
    e.prn = PRNS[i];
    e.week = week;
    e.iodc = e.iode = 33;
    e.sva = 2;
    e.svh = 0;
    e.tgd = 0.0;
    e.toc = toes;
    e.toes = toes;
    e.f0 = 1.8190e-4;
    e.f1 = -3.1e-12;
    e.f2 = 0.0;
    e.sqrtA = 5153.79012;
    e.e = 0.0123456;
    e.i0 = 0.958;
    e.M0 = M0S[i];
    e.OMG0 = OMG0S[i];
    e.omg = 0.70;
    e.deln = 4.5e-9;
    e.OMGd = -8.1e-9;
    e.idot = -5.0e-10;
    e.crs = -80.53125;
    e.crc = 250.15625;
    e.cuc = -6.1e-6;
    e.cus = 5.2e-6;
    e.cic = -1.2e-8;
    e.cis = 1.1e-7;
    quantize(e);
  }

  double rr[3];
  const double lat = lat_deg * M_PI / 180.0, lon = lon_deg * M_PI / 180.0;
  pos2ecef(lat, lon, h_m, rr);

  // ---- nav bitstreams -----------------------------------------------------
  // Emission grid: bit k of every satellite leaves the SV at grid time
  // k * 20 ms (SV clock).  Subframe 0 starts after the prefix; its
  // leading edge is labeled TOW0.  Capture-start GPS time is then
  // TOW0*6 - prefix_bits * bit_s (bit_s is the LABEL duration, 20 ms).
  const int prefix_bits = 60;
  const int tow0_6 = static_cast<int>((toes + 60.0) / 6.0);  // 58810
  const double bit_label_s = 0.020;
  const double t_gps0 = tow0_6 * 6.0 - prefix_bits * bit_label_s;
  const double bit_real_s = 0.001 * cib;  // actual on-air bit duration

  std::vector<std::vector<int8_t>> bits(n_sat);
  for (int i = 0; i < n_sat; ++i) {
    for (int k = 0; k < prefix_bits; ++k)
      bits[i].push_back(static_cast<int8_t>(k & 1));
    int d29 = 0, d30 = 0;
    static const int SEQ[4] = {5, 1, 2, 3};
    for (int r = 0; r < repeats; ++r)
      for (int s = 0; s < 4; ++s)
        build_subframe(SEQ[s], tow0_6 + 4 * r + s + 1, ephs[i], d29, d30,
                       bits[i]);
  }
  const int n_bits = static_cast<int>(bits[0].size());

  // ---- per-satellite truth at t = 0 ---------------------------------------
  std::vector<double> tau0(n_sat), dopp0(n_sat), elev(n_sat);
  for (int i = 0; i < n_sat; ++i) {
    tau0[i] = signal_delay(ephs[i], rr, t_gps0);
    const double h = 0.5;
    const double tp = signal_delay(ephs[i], rr, t_gps0 + h);
    const double tm = signal_delay(ephs[i], rr, t_gps0 - h);
    dopp0[i] = -F_L1 * (tp - tm) / (2.0 * h);
    const SatState s = eph_pos(ephs[i], t_gps0 - tau0[i]);
    elev[i] = elevation_deg(rr, s.pos, lat, lon);
  }

  // ---- synthesis ----------------------------------------------------------
  // Per 1 ms chunk: fit tau(t) with a quadratic through 3 exact
  // light-time solutions, then run phase/chip recurrences per sample.
  // Received sample: amp * d * c * cos(2*pi*(F_IF*t - F_L1*tau(t)));
  // emission grid time ts = t - tau(t); chip index = CHIP_RATE*ts;
  // nav bit = floor(chip / (1023*cib)) — code, bit, and carrier all
  // coherently derived from the same SV timebase, like the real signal.
  const int spe = static_cast<int>(FS * 1e-3);  // 16368, = 1023 words
  const double amp =
      std::sqrt(2.0 * std::pow(10.0, cn0_dbhz / 10.0) / FS);
  std::vector<std::vector<int8_t>> codes(n_sat);
  for (int i = 0; i < n_sat; ++i) codes[i] = ca_code(PRNS[i]);

  std::FILE *fo = std::fopen(out_path.c_str(), "wb");
  if (!fo) {
    std::fprintf(stderr, "cannot open %s\n", out_path.c_str());
    return 1;
  }
  std::mt19937_64 rng(seed);
  std::normal_distribution<double> gauss(0.0, 1.0);
  std::vector<double> acc(spe);
  std::vector<uint16_t> words(spe / 16);
  const double dt = 1.0 / FS;
  const long long grid_chips =
      static_cast<long long>(n_bits) * cib * CODE_LEN;

  // receiver TCXO: integrated fractional clock error (seconds of clock
  // error after x seconds); a clock-fast receiver samples the field at
  // true time T = t - tc(t) and its IF carries the extra -F_L1*tc(t)
  // phase — folded below into an effective tau'(x) = tau(T(x)) + tc(x)
  // so the existing quadratic-fit machinery applies unchanged
  auto tcxo_int = [&](double x) {
    return (tcxo_ppm * x + 0.5 * tcxo_drift * x * x) * 1e-6;
  };
  // oscillator phase-noise random walk, stepped per 1 ms chunk
  double pn_cycles = 0.0;
  const double pn_step = std::sqrt(pn_rad2_s * 1e-3) / (2.0 * M_PI);
  // RBJ biquad band-pass centered on the IF (front-end band-limiting);
  // only the shape matters ahead of a 1-bit quantizer
  double fb1 = 0, fb2 = 0, fa1 = 0, fa2 = 0;  // coeffs
  double fs1 = 0, fs2 = 0;                     // direct-form-II state
  if (fe_bw_hz > 0) {
    const double w0 = 2.0 * M_PI * F_IF / FS;
    const double q_fact = F_IF / fe_bw_hz;
    const double alpha = std::sin(w0) / (2.0 * q_fact);
    const double a0 = 1.0 + alpha;
    fb1 = alpha / a0;                 // b0 (= -b2), b1 = 0
    fb2 = -alpha / a0;
    fa1 = -2.0 * std::cos(w0) / a0;
    fa2 = (1.0 - alpha) / a0;
  }

  for (int ms = 0; ms < duration_ms; ++ms) {
    const double t0 = ms * 1e-3;
    std::fill(acc.begin(), acc.end(), 0.0);
    if (pn_rad2_s > 0) pn_cycles += pn_step * gauss(rng);
    for (int i = 0; i < n_sat; ++i) {
      // effective tau incl. the receiver clock error (see above)
      auto taueff = [&](double x) {
        const double tcv = tcxo_int(x);
        return signal_delay(ephs[i], rr, t_gps0 + x - tcv) + tcv;
      };
      // quadratic tau over the chunk
      const double ta = taueff(t0);
      const double tb = taueff(t0 + 0.5e-3);
      const double tc = taueff(t0 + 1.0e-3);
      const double h = 1e-3;
      const double B = (4.0 * tb - 3.0 * ta - tc) / h;
      const double Cq = 2.0 * (tc - 2.0 * tb + ta) / (h * h);
      // rays: direct + optional reflected copy (two-ray multipath)
      const int n_rays = (PRNS[i] == mp_prn && mp_amp != 0.0) ? 2 : 1;
      for (int ray = 0; ray < n_rays; ++ray) {
        const double ray_tau = ray ? mp_delay_chips / CHIP_RATE : 0.0;
        const double ray_amp = ray ? mp_amp : 1.0;
        const double ray_ph = ray ? mp_phase : 0.0;
        // phase in cycles: th(n) = th0 + th1*n + th2*n^2
        const double th0 =
            F_IF * t0 - F_L1 * (ta + ray_tau) + pn_cycles + ray_ph;
        const double th1 = (F_IF - F_L1 * B) * dt;
        const double th2 = -F_L1 * Cq * dt * dt;
        // chips: q(n) = q0 + q1*n + q2*n^2
        const double q0 = CHIP_RATE * (t0 - ta - ray_tau);
        const double q1 = CHIP_RATE * (dt - B * dt);
        const double q2 = -CHIP_RATE * Cq * dt * dt;
        const double TWO_PI = 2.0 * M_PI;
        double zr = std::cos(TWO_PI * th0), zi = std::sin(TWO_PI * th0);
        double wr = std::cos(TWO_PI * (th1 + th2)),
               wi = std::sin(TWO_PI * (th1 + th2));
        const double ur = std::cos(TWO_PI * 2.0 * th2),
                     ui = std::sin(TWO_PI * 2.0 * th2);
        double cq = q0, cstep = q1 + q2;
        const int8_t *code = codes[i].data();
        const int8_t *nav = bits[i].data();
        const long long bit_chips = static_cast<long long>(cib) * CODE_LEN;
        const double a_ray = amp * ray_amp;
        for (int n = 0; n < spe; ++n) {
          long long ci = static_cast<long long>(std::floor(cq));
          ci %= grid_chips;
          if (ci < 0) ci += grid_chips;
          const int chip = code[ci % CODE_LEN];
          const int bit = nav[ci / bit_chips];
          const double d = bit ? -1.0 : 1.0;
          acc[n] += a_ray * d * chip * zr;
          // chirp and chip recurrences
          const double nzr = zr * wr - zi * wi;
          zi = zr * wi + zi * wr;
          zr = nzr;
          const double nwr = wr * ur - wi * ui;
          wi = wr * ui + wi * ur;
          wr = nwr;
          cq += cstep;
          cstep += 2.0 * q2;
        }
      }
    }
    if (fe_bw_hz > 0 || dc_offset != 0.0) {
      // signal+noise through the front-end filter, then DC, then sign
      for (int n = 0; n < spe; ++n) {
        double x = acc[n] + gauss(rng);
        if (fe_bw_hz > 0) {
          const double w = x - fa1 * fs1 - fa2 * fs2;
          x = fb1 * w + fb2 * fs2;     // b1 == 0
          fs2 = fs1;
          fs1 = w;
        }
        acc[n] = x + dc_offset;
      }
      for (size_t w = 0; w < words.size(); ++w) {
        uint16_t v = 0;
        for (int b = 0; b < 16; ++b)
          if (acc[w * 16 + b] >= 0.0) v |= (1u << b);
        words[w] = v;
      }
    } else {
      // noise, 1-bit quantization, LSB-first 16-bit packing
      for (size_t w = 0; w < words.size(); ++w) {
        uint16_t v = 0;
        for (int b = 0; b < 16; ++b)
          if (acc[w * 16 + b] + gauss(rng) >= 0.0) v |= (1u << b);
        words[w] = v;
      }
    }
    std::fwrite(words.data(), sizeof(uint16_t), words.size(), fo);
  }
  std::fclose(fo);

  // ---- truth JSON ---------------------------------------------------------
  std::FILE *ft = std::fopen(truth_path.c_str(), "w");
  if (!ft) {
    std::fprintf(stderr, "cannot open %s\n", truth_path.c_str());
    return 1;
  }
  std::fprintf(ft, "{\n \"rr_ecef\": [%.6f, %.6f, %.6f],\n", rr[0], rr[1],
               rr[2]);
  std::fprintf(ft, " \"lat_deg\": %.9f, \"lon_deg\": %.9f, \"h_m\": %.3f,\n",
               lat_deg, lon_deg, h_m);
  std::fprintf(ft,
               " \"week\": %d, \"tow0_6s\": %d, \"cib\": %d,"
               " \"duration_ms\": %d, \"cn0_dbhz\": %.1f,\n",
               week, tow0_6, cib, duration_ms, cn0_dbhz);
  std::fprintf(ft,
               " \"impairments\": {\"tcxo_ppm\": %.6f,"
               " \"tcxo_drift_ppm_s\": %.6f, \"phase_noise_rad2_s\": %.6f,"
               " \"frontend_bw_hz\": %.1f, \"dc_offset\": %.4f,"
               " \"mp_prn\": %d, \"mp_delay_chips\": %.4f,"
               " \"mp_amp\": %.4f, \"mp_phase_cycles\": %.4f},\n",
               tcxo_ppm, tcxo_drift, pn_rad2_s, fe_bw_hz, dc_offset,
               mp_prn, mp_delay_chips, mp_amp, mp_phase);
  std::fprintf(ft, " \"sats\": [\n");
  for (int i = 0; i < n_sat; ++i) {
    const Eph &e = ephs[i];
    std::fprintf(
        ft,
        "  {\"prn\": %d, \"delay_ms\": %.9f, \"doppler_hz\": %.3f,"
        " \"elev_deg\": %.2f,\n   \"eph\": {\"week\": %d, \"iodc\": %d,"
        " \"iode\": %d, \"toes\": %.1f, \"toc\": %.1f,\n"
        "    \"f0\": %.17g, \"f1\": %.17g, \"f2\": %.17g, \"tgd\": %.17g,\n"
        "    \"sqrtA\": %.17g, \"e\": %.17g, \"i0\": %.17g, \"M0\": %.17g,\n"
        "    \"OMG0\": %.17g, \"omg\": %.17g, \"deln\": %.17g,"
        " \"OMGd\": %.17g,\n    \"idot\": %.17g, \"crs\": %.17g,"
        " \"crc\": %.17g, \"cuc\": %.17g,\n    \"cus\": %.17g,"
        " \"cic\": %.17g, \"cis\": %.17g}}%s\n",
        e.prn, tau0[i] * 1e3, dopp0[i], elev[i], e.week, e.iodc, e.iode,
        e.toes, e.toc, e.f0, e.f1, e.f2, e.tgd, e.sqrtA, e.e, e.i0, e.M0,
        e.OMG0, e.omg, e.deln, e.OMGd, e.idot, e.crs, e.crc, e.cuc, e.cus,
        e.cic, e.cis, (i + 1 < n_sat) ? "," : "");
  }
  std::fprintf(ft, " ]\n}\n");
  std::fclose(ft);

  for (int i = 0; i < n_sat; ++i)
    std::fprintf(stderr,
                 "PRN %2d: delay %.6f ms, doppler %+.1f Hz, elev %.1f deg\n",
                 PRNS[i], tau0[i] * 1e3, dopp0[i], elev[i]);
  std::fprintf(stderr, "wrote %d ms (%d bits/sat) to %s\n", duration_ms,
               n_bits, out_path.c_str());
  return 0;
}
