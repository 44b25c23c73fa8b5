//! Rust consumer of the icicle_tpu C ABI (include/icicle_tpu.h) — the role
//! the reference's wrappers/rust crates play over its FFI
//! (wrappers/rust/Cargo.toml:3-19): a non-C, non-Python prover process
//! driving the framework through the stable extern "C" boundary.
//!
//! Deliberately dependency-free (no cargo): build with
//!     bash tools/build_capi.sh
//!     rustc -O examples/rust-consumer/main.rs -L build -l icicle_tpu \
//!           -o build/rust_consumer
//!     LD_LIBRARY_PATH=build PYTHONPATH=. ./build/rust_consumer

use std::ffi::CString;
use std::os::raw::{c_char, c_int};

#[link(name = "icicle_tpu")]
extern "C" {
    fn icicle_tpu_init(platform: *const c_char) -> c_int;
    fn icicle_tpu_shutdown();
    fn icicle_tpu_last_error() -> *const c_char;
    fn icicle_tpu_field_limbs(field: *const c_char) -> c_int;
    fn icicle_tpu_ntt(
        field: *const c_char,
        data: *const u32,
        n: usize,
        dir: c_int,
        out: *mut u32,
    ) -> c_int;
    fn icicle_tpu_vec_op(
        field: *const c_char,
        op: *const c_char,
        a: *const u32,
        b: *const u32,
        n: usize,
        out: *mut u32,
    ) -> c_int;
    fn icicle_tpu_merkle_build(
        field: *const c_char,
        leaves: *const u32,
        n_leaves: usize,
        root_out: *mut u32,
    ) -> c_int;
    fn icicle_tpu_merkle_proof(
        field: *const c_char,
        leaves: *const u32,
        n_leaves: usize,
        leaf_idx: u64,
        proof_out: *mut u8,
        proof_len: *mut usize,
    ) -> c_int;
    fn icicle_tpu_merkle_verify(
        field: *const c_char,
        proof: *const u8,
        proof_len: usize,
        ok_out: *mut c_int,
    ) -> c_int;
    fn icicle_tpu_fri_prove(
        field: *const c_char,
        evals: *const u32,
        n: usize,
        stopping_degree: c_int,
        nof_queries: c_int,
        pow_bits: c_int,
        proof_out: *mut u8,
        proof_len: *mut usize,
    ) -> c_int;
    fn icicle_tpu_fri_verify(
        field: *const c_char,
        stopping_degree: c_int,
        nof_queries: c_int,
        pow_bits: c_int,
        proof: *const u8,
        proof_len: usize,
        ok_out: *mut c_int,
    ) -> c_int;
    fn icicle_tpu_lattice_decompose(
        input: *const u32,
        n: usize,
        base: u32,
        nof_digits: usize,
        out: *mut u32,
    ) -> c_int;
    fn icicle_tpu_lattice_recompose(
        digits: *const u32,
        total: usize,
        base: u32,
        out_size: usize,
        out: *mut u32,
    ) -> c_int;
    fn icicle_tpu_norm_check(
        input: *const u32,
        n: usize,
        norm: *const c_char,
        bound: u64,
        ok_out: *mut c_int,
    ) -> c_int;
    fn icicle_tpu_poly_mul(
        field: *const c_char,
        a: *const u32,
        na: usize,
        b: *const u32,
        nb: usize,
        out: *mut u32,
    ) -> c_int;
    fn icicle_tpu_poly_eval(
        field: *const c_char,
        a: *const u32,
        na: usize,
        x: *const u32,
        out: *mut u32,
    ) -> c_int;
}

fn last_error() -> String {
    unsafe {
        std::ffi::CStr::from_ptr(icicle_tpu_last_error())
            .to_string_lossy()
            .into_owned()
    }
}

fn main() {
    let cpu = CString::new("cpu").unwrap();
    let babybear = CString::new("babybear").unwrap();
    unsafe {
        assert_eq!(icicle_tpu_init(cpu.as_ptr()), 0, "init: {}", last_error());
        assert_eq!(icicle_tpu_field_limbs(babybear.as_ptr()), 1);

        // NTT roundtrip
        const N: usize = 32;
        let p: u64 = 2013265921;
        let data: Vec<u32> = (0..N).map(|i| ((i as u64 * 0xABCD) % p) as u32).collect();
        let mut fwd = vec![0u32; N];
        let mut back = vec![0u32; N];
        assert_eq!(
            icicle_tpu_ntt(babybear.as_ptr(), data.as_ptr(), N, 0, fwd.as_mut_ptr()),
            0,
            "ntt fwd: {}",
            last_error()
        );
        assert_eq!(
            icicle_tpu_ntt(babybear.as_ptr(), fwd.as_ptr(), N, 1, back.as_mut_ptr()),
            0
        );
        assert_eq!(data, back, "ntt roundtrip mismatch");
        println!("rust: ntt roundtrip OK");

        // vec add/sub roundtrip
        let add = CString::new("add").unwrap();
        let sub = CString::new("sub").unwrap();
        let b: Vec<u32> = (0..N).map(|i| ((i as u64 * 0x1234) % p) as u32).collect();
        let mut s = vec![0u32; N];
        let mut d = vec![0u32; N];
        assert_eq!(
            icicle_tpu_vec_op(babybear.as_ptr(), add.as_ptr(), data.as_ptr(), b.as_ptr(), N, s.as_mut_ptr()),
            0
        );
        assert_eq!(
            icicle_tpu_vec_op(babybear.as_ptr(), sub.as_ptr(), s.as_ptr(), b.as_ptr(), N, d.as_mut_ptr()),
            0
        );
        assert_eq!(data, d, "vec add/sub roundtrip mismatch");
        println!("rust: vec_ops OK");

        // Merkle build + prove + verify
        let leaves: Vec<u32> = (1..=64u32).collect();
        let mut root = [0u32; 1];
        assert_eq!(
            icicle_tpu_merkle_build(babybear.as_ptr(), leaves.as_ptr(), 64, root.as_mut_ptr()),
            0,
            "merkle build: {}",
            last_error()
        );
        let mut proof = vec![0u8; 4096];
        let mut plen = proof.len();
        assert_eq!(
            icicle_tpu_merkle_proof(
                babybear.as_ptr(),
                leaves.as_ptr(),
                64,
                7,
                proof.as_mut_ptr(),
                &mut plen
            ),
            0
        );
        let mut ok: c_int = -1;
        assert_eq!(
            icicle_tpu_merkle_verify(babybear.as_ptr(), proof.as_ptr(), plen, &mut ok),
            0
        );
        assert_eq!(ok, 1, "merkle proof did not verify");
        proof[17] ^= 1; // flip a bit inside the leaf bytes (header is 17 B)
        assert_eq!(
            icicle_tpu_merkle_verify(babybear.as_ptr(), proof.as_ptr(), plen, &mut ok),
            0
        );
        assert_eq!(ok, 0, "tampered merkle proof verified");
        println!("rust: merkle build/prove/verify OK (root={})", root[0]);

        // FRI prove + verify over 2^8 evaluations
        let evals: Vec<u32> = (0..256u64).map(|i| ((i * 7 + 3) % p) as u32).collect();
        let mut fproof = vec![0u8; 1 << 20];
        let mut flen = fproof.len();
        assert_eq!(
            icicle_tpu_fri_prove(
                babybear.as_ptr(), evals.as_ptr(), 256, 0, 10, 0,
                fproof.as_mut_ptr(), &mut flen
            ),
            0,
            "fri prove: {}",
            last_error()
        );
        assert_eq!(
            icicle_tpu_fri_verify(
                babybear.as_ptr(), 0, 10, 0, fproof.as_ptr(), flen, &mut ok
            ),
            0
        );
        assert_eq!(ok, 1, "fri proof did not verify");
        fproof[flen / 2] ^= 1;
        assert_eq!(
            icicle_tpu_fri_verify(
                babybear.as_ptr(), 0, 10, 0, fproof.as_ptr(), flen, &mut ok
            ),
            0
        );
        assert_eq!(ok, 0, "tampered fri proof verified");
        println!("rust: fri prove/verify OK ({} B proof)", flen);

        // lattice decompose/recompose roundtrip + norm check (babykoala Zq)
        const NL: usize = 8;
        const DIGITS: usize = 16;
        let mut zq = [0u32; NL * 2];
        for i in 0..NL {
            zq[2 * i] = (i as u32) * 1234567 + 1;
        }
        let mut digits = vec![0u32; DIGITS * NL * 2];
        let mut back = [0u32; NL * 2];
        assert_eq!(
            icicle_tpu_lattice_decompose(zq.as_ptr(), NL, 16, DIGITS, digits.as_mut_ptr()),
            0,
            "lattice decompose: {}",
            last_error()
        );
        assert_eq!(
            icicle_tpu_lattice_recompose(digits.as_ptr(), DIGITS * NL, 16, NL, back.as_mut_ptr()),
            0
        );
        assert_eq!(zq, back, "lattice roundtrip mismatch");
        let linf = CString::new("LInfinity").unwrap();
        assert_eq!(
            icicle_tpu_norm_check(zq.as_ptr(), NL, linf.as_ptr(), 123456789, &mut ok),
            0
        );
        assert_eq!(ok, 1, "norm check should pass");
        println!("rust: lattice decompose/recompose/norm OK");

        // polynomial API: (x+1)(x+2) = x^2+3x+2, eval at 5
        let pa = [1u32, 1u32];
        let pb = [2u32, 1u32];
        let mut prod = [0u32; 3];
        assert_eq!(
            icicle_tpu_poly_mul(babybear.as_ptr(), pa.as_ptr(), 2, pb.as_ptr(), 2, prod.as_mut_ptr()),
            0,
            "poly mul: {}",
            last_error()
        );
        assert_eq!(prod, [2, 3, 1], "poly mul coefficients");
        let x = [5u32];
        let mut ev = [0u32; 1];
        assert_eq!(
            icicle_tpu_poly_eval(babybear.as_ptr(), prod.as_ptr(), 3, x.as_ptr(), ev.as_mut_ptr()),
            0
        );
        assert_eq!(ev[0], 42, "poly eval value");
        println!("rust: polynomial mul/eval OK");

        icicle_tpu_shutdown();
    }
    println!("RUST CONSUMER: ALL CHECKS PASSED");
}
