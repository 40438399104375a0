package graft.tools

import java.io.{BufferedInputStream, FileInputStream}
import scala.io.Source
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Post-hoc forensics over a Spark event log (the ones Bench writes
  * under ./spark-events): per-stage wall / task-count / task-time
  * rollup, attributed to the per-query job groups Bench sets. This is
  * the tool that turns "q44 was slow in the driver's run" into "q44's
  * post-shuffle distinct stage ran N tasks for S seconds" without a
  * history server in the image.
  *
  * Usage: `runMain graft.tools.EventLogDigest <eventlog-dir-or-file>
  * [topN]` — accepts a rolling event-log directory
  * (`eventlog_v2_local-*`) or a single (optionally .zstd) event file.
  */
object EventLogDigest {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EventLogDigest <eventlog-dir-or-file> [topN]")
    val topN = if (args.length > 1) args(1).toInt else 15
    val target = new java.io.File(args(0))
    val files: Seq[java.io.File] =
      if (target.isDirectory)
        target.listFiles().toSeq
          .filter(_.getName.startsWith("events_")).sortBy(_.getName)
      else Seq(target)

    val stageWall = scala.collection.mutable.LinkedHashMap
      .empty[Long, (String, Long, Long)] // id -> (name, tasks, wallMs)
    val stageTaskRun = scala.collection.mutable.Map
      .empty[Long, Long].withDefaultValue(0L)
    val stageTaskCpu = scala.collection.mutable.Map
      .empty[Long, Long].withDefaultValue(0L)
    val stageGroup = scala.collection.mutable.Map.empty[Long, String]

    implicit val fmts: Formats = DefaultFormats
    for (f <- files) {
      val raw = new BufferedInputStream(new FileInputStream(f))
      val in =
        if (f.getName.endsWith(".zstd"))
          org.apache.spark.GraftSparkBridge.eventLogInputStream(raw, "zstd")
        else raw
      val src = Source.fromInputStream(in, "UTF-8")
      try src.getLines().foreach { line =>
        val j = JsonMethods.parse(line)
        (j \ "Event").extractOpt[String] match {
          case Some("SparkListenerJobStart") =>
            val group = (j \ "Properties" \ "spark.jobGroup.id")
              .extractOpt[String].getOrElse("")
            if (group.nonEmpty)
              (j \ "Stage IDs").extract[Seq[Long]]
                .foreach(sid => stageGroup(sid) = group)
          case Some("SparkListenerStageCompleted") =>
            val si = j \ "Stage Info"
            val id = (si \ "Stage ID").extract[Long]
            val name = (si \ "Stage Name").extract[String]
            val n = (si \ "Number of Tasks").extract[Long]
            val wall = for {
              sub <- (si \ "Submission Time").extractOpt[Long]
              comp <- (si \ "Completion Time").extractOpt[Long]
            } yield comp - sub
            stageWall(id) = (name, n, wall.getOrElse(-1L))
          case Some("SparkListenerTaskEnd") =>
            val sid = (j \ "Stage ID").extract[Long]
            (j \ "Task Metrics" \ "Executor Run Time").extractOpt[Long]
              .foreach(ms => stageTaskRun(sid) += ms)
            (j \ "Task Metrics" \ "Executor CPU Time").extractOpt[Long]
              .foreach(ns => stageTaskCpu(sid) += ns / 1000000L)
          case _ =>
        }
      } finally src.close()
    }

    def fmt(id: Long): String = {
      val (name, n, wall) = stageWall(id)
      val g = stageGroup.getOrElse(id, "-")
      f"stage $id%4d  tasks=$n%4d  wall=${wall / 1000.0}%7.2fs  " +
        f"taskRun=${stageTaskRun(id) / 1000.0}%8.2fs  " +
        f"taskCpu=${stageTaskCpu(id) / 1000.0}%8.2fs  group=$g%-22s  " +
        name.linesIterator.next().take(60)
    }

    println(s"== top $topN stages by wall clock ==")
    stageWall.keys.toSeq.sortBy(id => -stageWall(id)._3).take(topN)
      .foreach(id => println(fmt(id)))

    val grouped = stageWall.keys.toSeq.groupBy(stageGroup.getOrElse(_, ""))
    val named = grouped.filter(_._1.nonEmpty)
    if (named.nonEmpty) {
      println("\n== per job group (wall = sum of its stages' walls) ==")
      named.toSeq
        .map { case (g, ids) =>
          (g, ids.map(stageWall(_)._3).sum, ids.map(stageTaskRun).sum,
            ids.map(stageWall(_)._2).sum, ids.length)
        }
        .sortBy { case (_, wall, _, _, _) => -wall }
        .foreach { case (g, wall, run, tasks, nStages) =>
          println(f"$g%-24s stages=$nStages%3d tasks=$tasks%5d " +
            f"stageWall=${wall / 1000.0}%7.2fs taskRun=${run / 1000.0}%8.2fs")
        }
    }
  }
}
