//! Smoke test for the safe Rust wrapper (wrappers/rust/icicle_tpu.rs):
//! NTT roundtrip, vec ops, Merkle root, polynomial mul/eval, and the
//! lattice decompose/recompose roundtrip — all through the typed API.

extern crate icicle_tpu;

use icicle_tpu::{IcicleTpu, NttDir};

fn main() {
    let rt = IcicleTpu::init(Some("cpu")).expect("init");
    assert_eq!(rt.field_limbs("babybear").unwrap(), 1);

    // NTT roundtrip
    const N: usize = 32;
    let p: u64 = 2013265921;
    let data: Vec<u32> = (0..N).map(|i| ((i as u64 * 0xBEEF) % p) as u32).collect();
    let fwd = rt.ntt("babybear", &data, N, NttDir::Forward).unwrap();
    let back = rt.ntt("babybear", &fwd, N, NttDir::Inverse).unwrap();
    assert_eq!(data, back, "ntt roundtrip");
    println!("wrapper: ntt roundtrip OK");

    // vec add/sub roundtrip
    let b: Vec<u32> = (0..N).map(|i| ((i as u64 * 77) % p) as u32).collect();
    let s = rt.vec_op("babybear", "add", &data, &b, N).unwrap();
    let d = rt.vec_op("babybear", "sub", &s, &b, N).unwrap();
    assert_eq!(data, d, "vec roundtrip");
    println!("wrapper: vec_ops OK");

    // Merkle root (same inputs as the raw-FFI consumer: roots must agree)
    let leaves: Vec<u32> = (1..=64u32).collect();
    let root = rt.merkle_root("babybear", &leaves, 64).unwrap();
    println!("wrapper: merkle root OK ({})", root[0]);

    // polynomial (x+1)(x+2) = x^2+3x+2; eval at 5 -> 42
    let pa = [1u32, 1u32];
    let pb = [2u32, 1u32];
    let prod = rt.poly_mul("babybear", &pa, 2, &pb, 2).unwrap();
    assert_eq!(prod, vec![2, 3, 1], "poly mul");
    let ev = rt.poly_eval("babybear", &prod, 3, &[5u32]).unwrap();
    assert_eq!(ev[0], 42, "poly eval");
    println!("wrapper: polynomial OK");

    // lattice roundtrip
    let mut zq = vec![0u32; 8 * 2];
    for i in 0..8 {
        zq[2 * i] = (i as u32) * 999_983 + 1;
    }
    let digits = rt.lattice_decompose(&zq, 8, 16, 16).unwrap();
    let back = rt.lattice_recompose(&digits, 16 * 8, 16, 8).unwrap();
    assert_eq!(zq, back, "lattice roundtrip");
    println!("wrapper: lattice OK");

    println!("RUST WRAPPER: ALL CHECKS PASSED");
}
