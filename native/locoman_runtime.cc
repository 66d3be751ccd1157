// tpu-locoman native deployment runtime.
//
// The reference deploys a compiled Fatrop solver (.so with a C ABI,
// codegen/ + run_mpc.py:53) driven by a host loop that packs a positional
// parameter vector each tick (run_mpc.py:84-96).  This library is the
// TPU-native analog of that hardware-side plumbing, kept out of Python so a
// real-time control thread never touches the GIL:
//
//  - gait schedule generation (trot/walk/stand over geometric timesteps),
//    bit-matching tpu_locoman/gait.py;
//  - the per-tick parameter pack (x_init, schedules, targets) in the flat
//    ABI consumed by the AOT-exported MPC step;
//  - a lock-free single-writer/single-reader latest-value ring buffer for
//    robot-state ingestion (the data-loader analog).
//
// Exposed as a C ABI consumed from Python via ctypes
// (tpu_locoman/native.py); no pybind11 dependency.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Geometric timestep schedule: dt_i = dt_min * gamma^i,
// gamma = (dt_max/dt_min)^(1/(nodes-1))   (reference ocp.py:71-74)
// ---------------------------------------------------------------------------
void locoman_geometric_dts(double dt_min, double dt_max, int nodes,
                           double* dts_out) {
  double gamma = std::pow(dt_max / dt_min, 1.0 / (nodes - 1));
  double dt = dt_min;
  for (int i = 0; i < nodes; ++i) {
    dts_out[i] = dt;
    dt *= gamma;
  }
}

// ---------------------------------------------------------------------------
// Gait schedules (reference utils/gait_sequence.py:26-77).
// gait_type: 0 = trot, 1 = walk, 2 = stand.
// contact_out/swing_out: row-major (4, nodes), foot order FR, FL, RR, RL.
// ---------------------------------------------------------------------------
void locoman_gait_schedule(int gait_type, double gait_period, double t_current,
                           const double* dts, int nodes, double* contact_out,
                           double* swing_out) {
  double swing_period;
  switch (gait_type) {
    case 0: swing_period = 0.5 * gait_period; break;
    case 1: swing_period = 0.25 * gait_period; break;
    default: swing_period = gait_period; break;
  }
  for (int i = 0; i < 4 * nodes; ++i) {
    contact_out[i] = 1.0;
    swing_out[i] = 0.0;
  }
  if (gait_type == 2) return;  // stand: all feet in contact

  double t = t_current;
  for (int i = 0; i < nodes; ++i) {
    if (i > 0) t += dts[i - 1];
    double gait_phase = std::fmod(t, gait_period) / gait_period;
    double swing_phase = std::fmod(t, swing_period) / swing_period;
    if (gait_type == 0) {  // trot: FR+RL swing in first half
      if (gait_phase < 0.5) {
        contact_out[0 * nodes + i] = 0.0;
        contact_out[3 * nodes + i] = 0.0;
        swing_out[0 * nodes + i] = swing_phase;
        swing_out[3 * nodes + i] = swing_phase;
      } else {
        contact_out[1 * nodes + i] = 0.0;
        contact_out[2 * nodes + i] = 0.0;
        swing_out[1 * nodes + i] = swing_phase;
        swing_out[2 * nodes + i] = swing_phase;
      }
    } else {  // walk: quarters FL, RR, FR, RL
      int foot;
      if (gait_phase < 0.25) foot = 1;
      else if (gait_phase < 0.5) foot = 2;
      else if (gait_phase < 0.75) foot = 0;
      else foot = 3;
      contact_out[foot * nodes + i] = 0.0;
      swing_out[foot * nodes + i] = swing_phase;
    }
  }
}

// ---------------------------------------------------------------------------
// Swing-foot vertical velocity profile (gait_sequence.py:96-133).
// ---------------------------------------------------------------------------
static double cubic_spline_vel(double t0, double t1, double pos0, double vel0,
                               double pos1, double vel1, double t) {
  double dt = t1 - t0;
  double dpos = pos1 - pos0;
  double dvel = vel1 - vel0;
  double c1 = vel0 * dt;
  double c2 = -(3.0 * vel0 + dvel) * dt + 3.0 * dpos;
  double c3 = (2.0 * vel0 + dvel) * dt - 2.0 * dpos;
  double tn = (t - t0) / dt;
  return (3.0 * c3 * tn * tn + 2.0 * c2 * tn + c1) / dt;
}

double locoman_spline_vel_z(double swing_phase, double swing_period,
                            double h_max, double v_liftoff,
                            double v_touchdown) {
  double mid = swing_period / 2.0;
  double t = swing_phase * swing_period;
  if (swing_phase < 0.5)
    return cubic_spline_vel(0.0, mid, 0.0, v_liftoff, h_max, 0.0, t);
  return cubic_spline_vel(mid, swing_period, h_max, 0.0, 0.0, v_touchdown, t);
}

// ---------------------------------------------------------------------------
// Parameter-vector pack: the flat per-tick ABI (run_mpc.py:84-96 analog).
// Layout: [x_init(nx), contact(4*nodes), swing(4*nodes), base_vel_des(6),
//          ext_force_des(3), arm_vel_des(3), tau_prev(nj)]
// Returns packed length.
// ---------------------------------------------------------------------------
int locoman_pack_params(const double* x_init, int nx, const double* contact,
                        const double* swing, int nodes,
                        const double* base_vel_des, const double* ext_force_des,
                        const double* arm_vel_des, const double* tau_prev,
                        int nj, double* out) {
  int off = 0;
  std::memcpy(out + off, x_init, nx * sizeof(double)); off += nx;
  std::memcpy(out + off, contact, 4 * nodes * sizeof(double)); off += 4 * nodes;
  std::memcpy(out + off, swing, 4 * nodes * sizeof(double)); off += 4 * nodes;
  std::memcpy(out + off, base_vel_des, 6 * sizeof(double)); off += 6;
  std::memcpy(out + off, ext_force_des, 3 * sizeof(double)); off += 3;
  std::memcpy(out + off, arm_vel_des, 3 * sizeof(double)); off += 3;
  std::memcpy(out + off, tau_prev, nj * sizeof(double)); off += nj;
  return off;
}

// ---------------------------------------------------------------------------
// Lock-free latest-value ring buffer (single producer / single consumer).
// The state-estimator thread writes robot state at high rate; the MPC loop
// reads the most recent complete entry. Seqlock per slot.
// ---------------------------------------------------------------------------
struct LocomanRing {
  int slots;
  int width;
  std::vector<double> data;
  std::vector<std::atomic<uint64_t>> seq;
  std::atomic<uint64_t> head;
  explicit LocomanRing(int s, int w)
      : slots(s), width(w), data(static_cast<size_t>(s) * w),
        seq(static_cast<size_t>(s)), head(0) {
    for (auto& x : seq) x.store(0);
  }
};

void* locoman_ring_create(int slots, int width) {
  return new LocomanRing(slots, width);
}

void locoman_ring_destroy(void* ring) {
  delete static_cast<LocomanRing*>(ring);
}

void locoman_ring_push(void* ring_, const double* value) {
  auto* ring = static_cast<LocomanRing*>(ring_);
  uint64_t h = ring->head.load(std::memory_order_relaxed) + 1;
  int slot = static_cast<int>(h % ring->slots);
  // odd seq = write in progress
  ring->seq[slot].store(2 * h - 1, std::memory_order_release);
  std::memcpy(&ring->data[static_cast<size_t>(slot) * ring->width], value,
              ring->width * sizeof(double));
  ring->seq[slot].store(2 * h, std::memory_order_release);
  ring->head.store(h, std::memory_order_release);
}

// Returns the sequence number of the value read (0 if nothing yet).
uint64_t locoman_ring_read_latest(void* ring_, double* out) {
  auto* ring = static_cast<LocomanRing*>(ring_);
  for (;;) {
    uint64_t h = ring->head.load(std::memory_order_acquire);
    if (h == 0) return 0;
    int slot = static_cast<int>(h % ring->slots);
    uint64_t s0 = ring->seq[slot].load(std::memory_order_acquire);
    if (s0 != 2 * h) continue;  // being overwritten; retry with newer head
    std::memcpy(out, &ring->data[static_cast<size_t>(slot) * ring->width],
                ring->width * sizeof(double));
    uint64_t s1 = ring->seq[slot].load(std::memory_order_acquire);
    if (s0 == s1) return h;
  }
}

}  // extern "C"
