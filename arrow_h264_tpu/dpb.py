"""Decoded picture buffer: POC, reference lists, marking, output order.

Reference parity: JM-lineage `mbuffer.c` (SURVEY.md §2/§3.3; reference mount
empty — implemented from spec 8.2.1, 8.2.4, 8.2.5, Annex C bumping).

Host-side control logic.  Pixel storage is owned by the caller: each stored
picture carries an opaque `planes` payload (numpy planes for the oracle,
device DPB slot handles for the TPU pipeline).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .bitstream.params import SPS
from .bitstream.slicehdr import SliceHeader

# MaxDpbMbs per level (spec Table A-1)
_MAX_DPB_MBS = {
    9: 396, 10: 396, 11: 900, 12: 2376, 13: 2376, 20: 2376, 21: 4752,
    22: 8100, 30: 8100, 31: 18000, 32: 20480, 40: 32768, 41: 32768,
    42: 34816, 50: 110400, 51: 184320, 52: 184320,
}


@dataclass
class DPBPicture:
    uid: int                  # unique picture id (for deblock bS identity)
    frame_num: int
    poc: int
    planes: object            # caller-owned payload
    is_ref: bool = True
    long_term: bool = False
    lt_idx: int = -1
    frame_num_wrap: int = 0
    output_needed: bool = True
    slot: int = -1            # device DPB slot (assigned by caller)
    # colocated motion for B direct modes (spec 8.4.1.2.1), per 4x4 block:
    col_mv: object = None       # [H4, W4, 2] int32
    col_refidx: object = None   # [H4, W4] int8 (raw index in col pic's list)
    col_ref_uid: object = None  # [H4, W4] int32 (picture identity, -1 intra)


class DPB:
    def __init__(self, sps: SPS):
        self.sps = sps
        frame_mbs = sps.pic_width_in_mbs * sps.pic_height_in_map_units
        max_dpb_mbs = _MAX_DPB_MBS.get(sps.level_idc, 184320)
        self.max_dpb_frames = max(1, min(max_dpb_mbs // max(1, frame_mbs), 16))
        self.max_dpb_frames = max(self.max_dpb_frames, sps.max_num_ref_frames)
        self.pics: list[DPBPicture] = []
        self._uid = 0
        # POC state (8.2.1)
        self.prev_poc_msb = 0
        self.prev_poc_lsb = 0
        self.prev_frame_num = 0
        self.prev_frame_num_offset = 0
        self.mmco5_seen = False

    # ---- POC (spec 8.2.1) -------------------------------------------------

    def compute_poc(self, hdr: SliceHeader) -> int:
        sps = self.sps
        if hdr.is_idr:
            self.prev_poc_msb = 0
            self.prev_poc_lsb = 0
        if sps.pic_order_cnt_type == 0:
            max_lsb = sps.max_poc_lsb
            lsb = hdr.pic_order_cnt_lsb
            if lsb < self.prev_poc_lsb and \
                    (self.prev_poc_lsb - lsb) >= max_lsb // 2:
                msb = self.prev_poc_msb + max_lsb
            elif lsb > self.prev_poc_lsb and \
                    (lsb - self.prev_poc_lsb) > max_lsb // 2:
                msb = self.prev_poc_msb - max_lsb
            else:
                msb = self.prev_poc_msb
            poc = msb + lsb
            if hdr.nal_ref_idc:
                self.prev_poc_msb = msb
                self.prev_poc_lsb = lsb
            return poc
        if sps.pic_order_cnt_type == 2:
            if hdr.is_idr:
                fno = 0
            elif self.prev_frame_num > hdr.frame_num:
                fno = self.prev_frame_num_offset + sps.max_frame_num
            else:
                fno = self.prev_frame_num_offset
            self.prev_frame_num_offset = fno
            self.prev_frame_num = hdr.frame_num
            tmp = 2 * (fno + hdr.frame_num)
            return tmp if hdr.nal_ref_idc else tmp - 1
        if sps.pic_order_cnt_type == 1:
            if hdr.is_idr:
                fno = 0
            elif self.prev_frame_num > hdr.frame_num:
                fno = self.prev_frame_num_offset + sps.max_frame_num
            else:
                fno = self.prev_frame_num_offset
            self.prev_frame_num_offset = fno
            self.prev_frame_num = hdr.frame_num
            n_ref = len(sps.offset_for_ref_frame)
            abs_frame_num = fno + hdr.frame_num
            if hdr.nal_ref_idc == 0 and abs_frame_num > 0:
                abs_frame_num -= 1
            expected = 0
            if abs_frame_num > 0 and n_ref:
                cycle = (abs_frame_num - 1) // n_ref
                in_cycle = (abs_frame_num - 1) % n_ref
                sum_cycle = sum(sps.offset_for_ref_frame)
                expected = cycle * sum_cycle + \
                    sum(sps.offset_for_ref_frame[:in_cycle + 1])
            if hdr.nal_ref_idc == 0:
                expected += sps.offset_for_non_ref_pic
            return expected + hdr.delta_pic_order_cnt[0]
        raise NotImplementedError(f"poc type {self.sps.pic_order_cnt_type}")

    # ---- reference lists (spec 8.2.4) -------------------------------------

    def _short_refs(self):
        return [p for p in self.pics if p.is_ref and not p.long_term]

    def _long_refs(self):
        return sorted((p for p in self.pics if p.is_ref and p.long_term),
                      key=lambda p: p.lt_idx)

    def _update_frame_num_wrap(self, cur_frame_num: int) -> None:
        mfn = self.sps.max_frame_num
        for p in self._short_refs():
            p.frame_num_wrap = p.frame_num - mfn \
                if p.frame_num > cur_frame_num else p.frame_num

    def init_list_p(self, hdr: SliceHeader) -> list[DPBPicture]:
        self._update_frame_num_wrap(hdr.frame_num)
        lst = sorted(self._short_refs(), key=lambda p: -p.frame_num_wrap)
        lst += self._long_refs()
        return self._reorder(lst, hdr.ref_pic_list_mods_l0, hdr,
                             hdr.num_ref_idx_l0_active)

    def init_lists_b(self, hdr: SliceHeader, cur_poc: int):
        self._update_frame_num_wrap(hdr.frame_num)
        st = self._short_refs()
        before = sorted((p for p in st if p.poc <= cur_poc), key=lambda p: -p.poc)
        after = sorted((p for p in st if p.poc > cur_poc), key=lambda p: p.poc)
        lt = self._long_refs()
        l0 = before + after + lt
        l1 = after + before + lt
        if len(l0) > 1 and len(l1) > 1 and l0 == l1:
            l1 = [l1[1], l1[0]] + l1[2:]
        # Temporal direct may produce refIdxL0 > num_ref_idx_l0_active-1
        # (spec 8.4.1.2.3 note): keep the initial-order tail past num_active.
        f0 = self._reorder(l0, hdr.ref_pic_list_mods_l0, hdr,
                           hdr.num_ref_idx_l0_active)
        f1 = self._reorder(l1, hdr.ref_pic_list_mods_l1, hdr,
                           hdr.num_ref_idx_l1_active)
        f0 = f0 + [p for p in l0 if p not in f0]
        f1 = f1 + [p for p in l1 if p not in f1]
        return f0, f1

    def _reorder(self, lst, mods, hdr: SliceHeader, num_active: int):
        lst = list(lst)[:]
        # pad conceptually: reordering operates on a list of size num_active
        if not mods:
            return lst[:num_active]
        max_fn = self.sps.max_frame_num
        # spec 8.2.4.3: build with insertion semantics
        lst = lst + [None] * max(0, num_active - len(lst))
        lst = lst[:max(num_active, len(lst))]
        pred = hdr.frame_num
        idx = 0
        for m in mods:
            if m.idc in (0, 1):
                diff = m.value + 1
                pred = (pred - diff) % max_fn if m.idc == 0 else \
                    (pred + diff) % max_fn
                pic = next((p for p in self._short_refs()
                            if (p.frame_num % max_fn) == pred), None)
            else:
                pic = next((p for p in self._long_refs()
                            if p.lt_idx == m.value), None)
            if pic is None:
                raise ValueError("reorder target not in DPB")
            # move pic to position idx, shifting others right
            lst = [p for p in lst[:idx] if True] + [pic] + \
                [p for p in lst[idx:] if p is not pic]
            idx += 1
        return lst[:num_active]

    # ---- store + marking (spec 8.2.5) + bumping (Annex C) -----------------

    def store(self, planes, hdr: SliceHeader, poc: int):
        """Store the decoded picture.

        Returns (outputs, pic): output payloads ready for emission in order,
        and the stored DPBPicture (so the caller can assign a device slot).
        """
        out = []
        if hdr.is_idr:
            if hdr.no_output_of_prior_pics_flag:
                self.pics.clear()
            else:
                out.extend(self._bump_all())
            self.pics.clear()
        pic = DPBPicture(uid=self._uid, frame_num=hdr.frame_num, poc=poc,
                         planes=planes, is_ref=bool(hdr.nal_ref_idc))
        self._uid += 1
        if hdr.is_idr and hdr.long_term_reference_flag:
            pic.long_term = True
            pic.lt_idx = 0
        if pic.is_ref and not hdr.is_idr:
            if hdr.adaptive_ref_pic_marking_mode_flag:
                self._apply_mmco(hdr, pic)
            else:
                self._sliding_window()
        self.pics.append(pic)
        # bumping: emit smallest-POC while over capacity
        while len(self.pics) > self.max_dpb_frames:
            out.append(self._bump_one())
        return [o for o in out if o is not None], pic

    def _sliding_window(self) -> None:
        num_ref = sum(1 for p in self.pics if p.is_ref)
        if num_ref >= max(1, self.sps.max_num_ref_frames):
            st = self._short_refs()
            if st:
                oldest = min(st, key=lambda p: p.frame_num_wrap)
                oldest.is_ref = False
                self._gc()

    def _apply_mmco(self, hdr: SliceHeader, cur: DPBPicture) -> None:
        max_fn = self.sps.max_frame_num
        for m in hdr.mmcos:
            if m.op == 1:
                pic_num = hdr.frame_num - (m.val1 + 1)
                for p in self._short_refs():
                    if (p.frame_num_wrap % max_fn + max_fn) % max_fn == \
                            (pic_num % max_fn + max_fn) % max_fn or \
                            p.frame_num_wrap == pic_num:
                        p.is_ref = False
            elif m.op == 2:
                for p in self._long_refs():
                    if p.lt_idx == m.val1:
                        p.is_ref = False
            elif m.op == 3:
                pic_num = hdr.frame_num - (m.val1 + 1)
                for p in self._short_refs():
                    if p.frame_num_wrap == pic_num:
                        p.long_term = True
                        p.lt_idx = m.val2
            elif m.op == 4:
                keep = m.val1 - 1
                for p in self._long_refs():
                    if p.lt_idx > keep:
                        p.is_ref = False
            elif m.op == 5:
                for p in self.pics:
                    p.is_ref = False
                self.mmco5_seen = True
            elif m.op == 6:
                cur.long_term = True
                cur.lt_idx = m.val1
        self._gc()

    def _gc(self) -> None:
        self.pics = [p for p in self.pics if p.is_ref or p.output_needed]

    def _bump_one(self):
        cand = [p for p in self.pics if p.output_needed]
        if not cand:
            # drop a non-ref picture to make room
            self.pics = [p for p in self.pics if p.is_ref]
            return None
        pic = min(cand, key=lambda p: p.poc)
        pic.output_needed = False
        self._gc()
        return pic.planes

    def _bump_all(self):
        out = []
        while any(p.output_needed for p in self.pics):
            out.append(self._bump_one())
        return [o for o in out if o is not None]

    def flush(self):
        out = self._bump_all()
        self.pics.clear()
        return out
