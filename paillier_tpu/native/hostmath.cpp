// Native host-math runtime for paillier_tpu.
//
// The reference implementation does ALL of its big-integer arithmetic
// through libgmp via CGo (github.com/ncw/gmp, imported at
// reference paillier.go:10).  In the TPU framework the *data plane*
// (batched encrypt/decrypt/proof math) lives on device, but the
// *control plane* — key generation primality testing, safe-prime search
// (reference safe_prime.go:61-266), modular inverses for Lagrange
// combining (reference thresholdkey.go:132-138) — is host-side latency
// work where a native big-int library wins by an order of magnitude
// over Python ints.
//
// This file is that native runtime: a thin, exception-free C ABI over
// the system GMP shared library.  No GMP headers are required — the
// mpz ABI (struct layout + __gmpz_* entry points) has been stable for
// decades and is declared locally below.  All values cross the
// boundary as fixed-length big-endian byte buffers.
//
// Build (see paillier_tpu/native/__init__.py, which does this lazily):
//   g++ -O2 -shared -fPIC -std=c++17 hostmath.cpp \
//       /usr/lib/x86_64-linux-gnu/libgmp.so.10 -lpthread -o _hostmath.so

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

// ---------------------------------------------------------------------------
// GMP ABI (subset), declared locally.  Layouts match gmp.h on LP64.
// ---------------------------------------------------------------------------

typedef unsigned long mp_limb_t;

struct __mpz_struct {
  int _mp_alloc;
  int _mp_size;
  mp_limb_t *_mp_d;
};
typedef __mpz_struct mpz_t[1];

struct __gmp_randstate_struct {
  mpz_t _mp_seed;
  int _mp_alg;
  union {
    void *_mp_lc;
  } _mp_algdata;
};
typedef __gmp_randstate_struct gmp_randstate_t[1];

extern "C" {
void __gmpz_init(mpz_t);
void __gmpz_clear(mpz_t);
void __gmpz_set_ui(mpz_t, unsigned long);
void __gmpz_set(mpz_t, const mpz_t);
void __gmpz_import(mpz_t, size_t, int, size_t, int, size_t, const void *);
void *__gmpz_export(void *, size_t *, int, size_t, int, size_t, const mpz_t);
void __gmpz_powm(mpz_t, const mpz_t, const mpz_t, const mpz_t);
int __gmpz_probab_prime_p(const mpz_t, int);
int __gmpz_invert(mpz_t, const mpz_t, const mpz_t);
void __gmpz_gcd(mpz_t, const mpz_t, const mpz_t);
void __gmpz_mul(mpz_t, const mpz_t, const mpz_t);
void __gmpz_mod(mpz_t, const mpz_t, const mpz_t);
void __gmpz_add_ui(mpz_t, const mpz_t, unsigned long);
void __gmpz_sub_ui(mpz_t, const mpz_t, unsigned long);
void __gmpz_mul_2exp(mpz_t, const mpz_t, unsigned long);
unsigned long __gmpz_fdiv_ui(const mpz_t, unsigned long);
void __gmpz_setbit(mpz_t, unsigned long);
size_t __gmpz_sizeinbase(const mpz_t, int);
int __gmpz_cmp_ui(const mpz_t, unsigned long);
void __gmp_randinit_mt(gmp_randstate_t);
void __gmp_randclear(gmp_randstate_t);
void __gmp_randseed_ui(gmp_randstate_t, unsigned long);
void __gmpz_urandomb(mpz_t, gmp_randstate_t, unsigned long);
}

// ---------------------------------------------------------------------------
// Byte-buffer <-> mpz helpers (big-endian, fixed width on export)
// ---------------------------------------------------------------------------

static void import_be(mpz_t z, const uint8_t *buf, size_t len) {
  __gmpz_import(z, len, 1, 1, 1, 0, buf);
}

static void export_be(uint8_t *out, size_t outlen, const mpz_t z) {
  std::memset(out, 0, outlen);
  if (__gmpz_cmp_ui(z, 0) == 0) return;
  size_t nbytes = (__gmpz_sizeinbase(z, 2) + 7) / 8;
  if (nbytes > outlen) nbytes = outlen;  // caller sizes out correctly
  __gmpz_export(out + (outlen - nbytes), nullptr, 1, 1, 1, 0, z);
}

// ---------------------------------------------------------------------------
// Exported C API
// ---------------------------------------------------------------------------

extern "C" {

int pt_abi_version() { return 1; }

// out[ml] = (b^e) mod m
void pt_powm(const uint8_t *b, size_t bl, const uint8_t *e, size_t el,
             const uint8_t *m, size_t ml, uint8_t *out) {
  mpz_t zb, ze, zm, zr;
  __gmpz_init(zb);
  __gmpz_init(ze);
  __gmpz_init(zm);
  __gmpz_init(zr);
  import_be(zb, b, bl);
  import_be(ze, e, el);
  import_be(zm, m, ml);
  __gmpz_powm(zr, zb, ze, zm);
  export_be(out, ml, zr);
  __gmpz_clear(zb);
  __gmpz_clear(ze);
  __gmpz_clear(zm);
  __gmpz_clear(zr);
}

// Batched shared-exponent/modulus powm across n bases (each stride bytes),
// parallelized over threads.  Used for host-side verification sweeps.
void pt_powm_batch(const uint8_t *bases, size_t n, size_t stride,
                   const uint8_t *e, size_t el, const uint8_t *m, size_t ml,
                   uint8_t *out, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<size_t> next(0);
  auto worker = [&]() {
    mpz_t zb, ze, zm, zr;
    __gmpz_init(zb);
    __gmpz_init(ze);
    __gmpz_init(zm);
    __gmpz_init(zr);
    import_be(ze, e, el);
    import_be(zm, m, ml);
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= n) break;
      import_be(zb, bases + i * stride, stride);
      __gmpz_powm(zr, zb, ze, zm);
      export_be(out + i * ml, ml, zr);
    }
    __gmpz_clear(zb);
    __gmpz_clear(ze);
    __gmpz_clear(zm);
    __gmpz_clear(zr);
  };
  std::vector<std::thread> ts;
  for (int t = 1; t < n_threads; ++t) ts.emplace_back(worker);
  worker();
  for (auto &t : ts) t.join();
}

// 2 = definitely prime, 1 = probably prime, 0 = composite (GMP semantics:
// Baillie-PSW + reps Miller-Rabin rounds; cf. Go ProbablyPrime(20) used at
// reference safe_prime.go:256).
int pt_probab_prime(const uint8_t *x, size_t xl, int reps) {
  mpz_t z;
  __gmpz_init(z);
  import_be(z, x, xl);
  int r = __gmpz_probab_prime_p(z, reps);
  __gmpz_clear(z);
  return r;
}

// out[ml] = a^{-1} mod m; returns 1 if invertible else 0.
int pt_invert(const uint8_t *a, size_t al, const uint8_t *m, size_t ml,
              uint8_t *out) {
  mpz_t za, zm, zr;
  __gmpz_init(za);
  __gmpz_init(zm);
  __gmpz_init(zr);
  import_be(za, a, al);
  import_be(zm, m, ml);
  int ok = __gmpz_invert(zr, za, zm);
  if (ok) export_be(out, ml, zr);
  __gmpz_clear(za);
  __gmpz_clear(zm);
  __gmpz_clear(zr);
  return ok;
}

// out[outl] = gcd(a, b)
void pt_gcd(const uint8_t *a, size_t al, const uint8_t *b, size_t bl,
            uint8_t *out, size_t outl) {
  mpz_t za, zb, zr;
  __gmpz_init(za);
  __gmpz_init(zb);
  __gmpz_init(zr);
  import_be(za, a, al);
  import_be(zb, b, bl);
  __gmpz_gcd(zr, za, zb);
  export_be(out, outl, zr);
  __gmpz_clear(za);
  __gmpz_clear(zb);
  __gmpz_clear(zr);
}

// out[ml] = (a * b) mod m
void pt_mulmod(const uint8_t *a, size_t al, const uint8_t *b, size_t bl,
               const uint8_t *m, size_t ml, uint8_t *out) {
  mpz_t za, zb, zm;
  __gmpz_init(za);
  __gmpz_init(zb);
  __gmpz_init(zm);
  import_be(za, a, al);
  import_be(zb, b, bl);
  import_be(zm, m, ml);
  __gmpz_mul(za, za, zb);
  __gmpz_mod(za, za, zm);
  export_be(out, ml, za);
  __gmpz_clear(za);
  __gmpz_clear(zb);
  __gmpz_clear(zm);
}

// ---------------------------------------------------------------------------
// Safe-prime search (reference safe_prime.go:61-266): p = 2q + 1 with both
// prime, p exactly `bits` bits.  Mirrors the reference's filters — top two
// bits of q set, 15-small-prime sieve on q and p, reject q == 1 (mod 3)
// (forces 3 | p, safe_prime.go:225-241), Miller-Rabin/BPSW on q, Fermat
// base-2 (Pocklington) on p (safe_prime.go:272-278).  The reference's
// goroutine race becomes a std::thread race with an atomic first-winner
// flag.  Deterministic per (seed, n_threads): thread t draws from a
// Mersenne Twister seeded seed ^ splitmix(t).
// ---------------------------------------------------------------------------

static const unsigned kSieve[] = {3,  5,  7,  11, 13, 17, 19, 23,
                                  29, 31, 37, 41, 43, 47, 53};

// Returns 1 and fills out_p (bits-sized, big-endian) on success, 0 on timeout.
int pt_safe_prime(unsigned bits, unsigned long seed, double timeout_s,
                  int n_threads, uint8_t *out_p, size_t outl) {
  if (bits < 6) return -1;
  if (n_threads < 1) n_threads = 1;
  unsigned qbits = bits - 1;
  std::atomic<bool> found(false);
  std::mutex out_mu;
  auto deadline = std::chrono::steady_clock::now() +
                  std::chrono::duration<double>(timeout_s);

  auto worker = [&](int tid) {
    gmp_randstate_t rs;
    __gmp_randinit_mt(rs);
    unsigned long s = seed + 0x9E3779B97F4A7C15UL * (unsigned long)(tid + 1);
    __gmp_randseed_ui(rs, s);
    mpz_t q, p, pm1, two, t;
    __gmpz_init(q);
    __gmpz_init(p);
    __gmpz_init(pm1);
    __gmpz_init(two);
    __gmpz_init(t);
    __gmpz_set_ui(two, 2);
    int iter = 0;
    while (!found.load(std::memory_order_relaxed)) {
      if ((++iter & 0x3F) == 0 &&
          std::chrono::steady_clock::now() >= deadline)
        break;
      __gmpz_urandomb(q, rs, qbits);
      __gmpz_setbit(q, qbits - 1);
      if (qbits >= 2) __gmpz_setbit(q, qbits - 2);
      __gmpz_setbit(q, 0);
      bool bad = false;
      if (qbits > 6) {
        for (unsigned sp : kSieve) {
          unsigned long r = __gmpz_fdiv_ui(q, sp);
          if (r == 0 || (2 * r + 1) % sp == 0) {
            bad = true;
            break;
          }
        }
        if (!bad && __gmpz_fdiv_ui(q, 3) == 1) bad = true;
      }
      if (bad) continue;
      if (!__gmpz_probab_prime_p(q, 20)) continue;
      // p = 2q + 1; Fermat base 2 proves p prime given q prime (Pocklington)
      __gmpz_mul_2exp(p, q, 1);
      __gmpz_add_ui(p, p, 1);
      __gmpz_sub_ui(pm1, p, 1);
      __gmpz_powm(t, two, pm1, p);
      if (__gmpz_cmp_ui(t, 1) != 0) continue;
      if (__gmpz_sizeinbase(p, 2) != bits) continue;
      bool expect = false;
      if (found.compare_exchange_strong(expect, true)) {
        std::lock_guard<std::mutex> lk(out_mu);
        export_be(out_p, outl, p);
      }
      break;
    }
    __gmpz_clear(q);
    __gmpz_clear(p);
    __gmpz_clear(pm1);
    __gmpz_clear(two);
    __gmpz_clear(t);
    __gmp_randclear(rs);
  };

  std::vector<std::thread> ts;
  for (int t = 1; t < n_threads; ++t) ts.emplace_back(worker, t);
  worker(0);
  for (auto &t : ts) t.join();
  return found.load() ? 1 : 0;
}

// Random prime of exactly `bits` bits (top two bits set), optionally
// congruent to 3 mod 4 (reference paillier.go:131-137 requires p == q == 3
// mod 4).  Single-threaded (plain primes are cheap); deterministic per seed.
int pt_random_prime(unsigned bits, unsigned long seed, int want_3mod4,
                    uint8_t *out, size_t outl) {
  if (bits < 4) return -1;
  gmp_randstate_t rs;
  __gmp_randinit_mt(rs);
  __gmp_randseed_ui(rs, seed);
  mpz_t c;
  __gmpz_init(c);
  int found = 0;
  for (;;) {
    __gmpz_urandomb(c, rs, bits);
    __gmpz_setbit(c, bits - 1);
    __gmpz_setbit(c, bits - 2);
    __gmpz_setbit(c, 0);
    if (want_3mod4) __gmpz_setbit(c, 1);
    if (__gmpz_sizeinbase(c, 2) != bits) continue;
    if (__gmpz_probab_prime_p(c, 25)) {
      export_be(out, outl, c);
      found = 1;
      break;
    }
  }
  __gmpz_clear(c);
  __gmp_randclear(rs);
  return found;
}

}  // extern "C"
